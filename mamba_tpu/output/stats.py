"""Posterior statistics: summarystats, quantiles, HPD, autocorrelation,
change rate, MCSE/ESS.

TPU-native counterpart of reference src/output/stats.jl and src/output/
mcse.jl — same estimators, same defaults, vectorized over parameters with
numpy instead of the reference's per-column ``mapslices`` loops:

- ``summarystats``: Mean, SD, Naive SE, MCSE (batch means by default) and
  ESS = min((SD/MCSE)^2, niter)  (stats.jl:81-94)
- ``mcse``: batch-means ``bm`` (size 100), initial monotone ``imse`` and
  initial positive ``ipse`` sequence estimators (mcse.jl:3-46)
- ``hpd``: smallest-interval empirical HPD (stats.jl:55-77)
- ``autocor``: per-chain autocorrelation at thinning-relative lags
  (stats.jl:3-14); ``changerate`` (stats.jl:19-39); ``cor`` (stats.jl:16-17)
"""

from __future__ import annotations

import numpy as np

from .chains import Chains
from .chainsummary import ChainSummary


def _header(c: Chains) -> str:
    rng = c.range
    return ("Iterations = {}:{}\nThinning interval = {}\nChains = {}\n"
            "Samples per chain = {}\n".format(
                rng[0], rng[-1], c.thin,
                ",".join(str(i) for i in c.chains), c.niter))


def cummean_arr(x: np.ndarray) -> np.ndarray:
    """Running means over the leading axis (reference cummean,
    src/utils.jl:50-60)."""
    x = np.asarray(x, dtype=float)
    n = np.arange(1, x.shape[0] + 1).reshape((-1,) + (1,) * (x.ndim - 1))
    return np.cumsum(x, axis=0) / n


def autocov(x: np.ndarray, lags) -> np.ndarray:
    """Biased (1/n) autocovariances at the given lags over the leading axis;
    x may be (n,) or (n, p)."""
    x = np.asarray(x, dtype=float)
    one_d = x.ndim == 1
    if one_d:
        x = x[:, None]
    n = x.shape[0]
    xc = x - x.mean(0)
    out = np.empty((len(lags), x.shape[1]))
    for i, k in enumerate(lags):
        k = int(k)
        out[i] = (xc[: n - k] * xc[k:]).sum(0) / n if k < n else 0.0
    return out[:, 0] if one_d else out


def mcse(x: np.ndarray, method: str = "imse", **kwargs) -> float:
    x = np.asarray(x, dtype=float).reshape(-1)
    if method == "bm":
        return _mcse_bm(x, **kwargs)
    if method == "imse":
        return _mcse_imse(x)
    if method == "ipse":
        return _mcse_ipse(x)
    raise ValueError(f"unsupported mcse method {method!r}")


def _mcse_bm(x, size: int = 100) -> float:
    n = len(x)
    m = n // size
    if m < 2:
        raise ValueError(
            f"iterations are < {2 * size} and batch size is > {n // 2}")
    mbar = x[: m * size].reshape(m, size).mean(1)
    return float(mbar.std(ddof=1) / np.sqrt(m))


def _paired_gamma(x):
    """Sums of adjacent autocovariance pairs Γ_i = γ_{2i} + γ_{2i+1}."""
    n = len(x)
    m = (n - 2) // 2
    lags = np.arange(0, 2 * m + 2)
    g = autocov(x, lags)
    return g, m


def _mcse_imse(x) -> float:
    g, m = _paired_gamma(x)
    n = len(x)
    Ghat = g[0] + g[1]
    value = -g[0] + 2 * Ghat
    for i in range(1, m + 1):
        Ghat = min(Ghat, g[2 * i] + g[2 * i + 1])
        if Ghat <= 0:
            break
        value += 2 * Ghat
    return float(np.sqrt(value / n))


def _mcse_ipse(x) -> float:
    g, m = _paired_gamma(x)
    n = len(x)
    value = g[0] + 2 * g[1]
    for i in range(1, m + 1):
        Ghat = g[2 * i] + g[2 * i + 1]
        if Ghat <= 0:
            break
        value += 2 * Ghat
    return float(np.sqrt(value / n))


def summarystats(c: Chains, etype: str = "bm", **kwargs) -> ChainSummary:
    """Empirical posterior estimates table (reference stats.jl:81-94)."""
    comb = c.combine()          # (niter*nchains, p)
    n = comb.shape[0]
    mean = comb.mean(0)
    sd = comb.std(0, ddof=1)
    naive = sd / np.sqrt(n)
    mc = np.array([mcse(comb[:, j], etype, **kwargs)
                   for j in range(comb.shape[1])])
    with np.errstate(divide="ignore", invalid="ignore"):
        ess = np.minimum((sd / mc) ** 2, c.niter)
    vals = np.column_stack([mean, sd, naive, mc, ess])
    return ChainSummary(vals, c.names,
                        ["Mean", "SD", "Naive SE", "MCSE", "ESS"], _header(c))


def quantile(c: Chains, q=(0.025, 0.25, 0.5, 0.75, 0.975)) -> ChainSummary:
    comb = c.combine()
    vals = np.quantile(comb, list(q), axis=0).T
    labels = [f"{100 * p:g}%" for p in q]
    return ChainSummary(vals, c.names, labels, _header(c))


def hpd(c: Chains, alpha: float = 0.05) -> ChainSummary:
    """Per-parameter smallest-width empirical interval containing
    (1-alpha) of the draws (reference stats.jl:55-77)."""
    comb = c.combine()
    n = comb.shape[0]
    m = max(1, int(np.ceil(alpha * n)))
    y = np.sort(comb, axis=0)
    a = y[:m]                      # candidate lower bounds
    b = y[n - m:]                  # candidate upper bounds
    i = np.argmin(b - a, axis=0)
    cols = np.arange(comb.shape[1])
    vals = np.column_stack([a[i, cols], b[i, cols]])
    pct = f"{100 * (1 - alpha):g}"
    return ChainSummary(vals, c.names, [f"{pct}% Lower", f"{pct}% Upper"],
                        _header(c))


def autocor(c: Chains, lags=(1, 5, 10, 50), relative: bool = True) -> ChainSummary:
    lags = np.asarray(lags, dtype=int)
    if relative:
        lags = lags * c.thin
    elif np.any(lags % c.thin != 0):
        raise ValueError("lags do not correspond to thinning interval")
    labels = [f"Lag {k}" for k in lags]
    out = np.empty((c.nparams, len(lags), c.nchains))
    rel = lags // c.thin
    for k in range(c.nchains):
        g = autocov(c.value[:, :, k], [0] + list(rel))
        out[:, :, k] = (g[1:] / g[0]).T
    return ChainSummary(out, c.names, labels, _header(c))


def cor(c: Chains) -> ChainSummary:
    comb = c.combine()
    return ChainSummary(np.corrcoef(comb, rowvar=False), c.names, c.names,
                        _header(c))


def changerate(c: Chains) -> ChainSummary:
    """Per-parameter (and joint 'Multivariate') state-change frequency — the
    acceptance-rate proxy (reference stats.jl:19-39)."""
    v = c.value
    n, p, m = v.shape
    d = v[1:] != v[:-1]                       # (n-1, p, m)
    r = d.sum(axis=(0, 2)) / (m * (n - 1))
    r_mv = d.any(axis=1).sum() / (m * (n - 1))
    vals = np.round(np.concatenate([r, [r_mv]]), 3)
    return ChainSummary(vals[:, None], c.names + ["Multivariate"],
                        ["Change Rate"], _header(c))


def describe(c: Chains, q=(0.025, 0.25, 0.5, 0.75, 0.975), etype: str = "bm",
             stream=None, **kwargs):
    """Print Empirical Posterior Estimates + Quantiles (reference
    stats.jl:41-52).  Returns (summarystats, quantiles)."""
    import sys
    stream = stream or sys.stdout
    s = summarystats(c, etype=etype, **kwargs)
    qs = quantile(c, q=q)
    print(s.header, file=stream)
    print("Empirical Posterior Estimates:", file=stream)
    print(repr(ChainSummary(s.value, s.rownames, s.colnames)), file=stream)
    print("Quantiles:", file=stream)
    print(repr(ChainSummary(qs.value, qs.rownames, qs.colnames)), file=stream)
    return s, qs
