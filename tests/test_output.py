"""Output-layer tests: diagnostics, model-based stats, file I/O.

The reference's only exercise of these paths is `gelmandiag(sim) |> show`
over example runs (test/runexamples.jl:42); here each estimator is asserted
on constructed chains with known properties plus a live model run.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt
from mamba_tpu.models import line
from mamba_tpu.output.diagnostics import (gewekediag_vec, heideldiag_vec,
                                          pcramer, rafterydiag_vec)


def iid_chains(n=2000, p=2, m=3, seed=0):
    rng = np.random.default_rng(seed)
    return mt.Chains(rng.normal(0, 1, (n, p, m)), start=1, thin=1,
                     names=[f"x{i}" for i in range(p)])


@pytest.fixture(scope="module")
def line_sim():
    model, inputs, inits = line.build()
    return mt.mcmc(model, inputs, inits, 2000, burnin=500, thin=2, chains=3,
                   verbose=False)


# -- gelman ------------------------------------------------------------------

def test_gelman_iid_near_one():
    g = gelmandiag_vals(iid_chains())
    assert np.all(np.abs(g[:, 0] - 1.0) < 0.02)
    assert np.all(g[:, 1] >= g[:, 0] - 1e-8)


def gelmandiag_vals(c, **kw):
    return mt.gelmandiag(c, **kw).value[:, :, 0]


def test_gelman_detects_nonconvergence():
    c = iid_chains()
    c.value[:, 0, 0] += 5.0        # one chain offset -> PSRF >> 1
    g = gelmandiag_vals(c)
    assert g[0, 0] > 1.5 and abs(g[1, 0] - 1.0) < 0.05


def test_gelman_needs_two_chains():
    c = iid_chains(m=1)
    with pytest.raises(ValueError):
        mt.gelmandiag(c)


def test_gelman_mpsrf_and_transform():
    c = iid_chains()
    g = mt.gelmandiag(c, mpsrf=True, transform=True)
    assert g.rownames[-1] == "Multivariate"
    assert abs(g.value[-1, 0, 0] - 1.0) < 0.1


def test_gelman_on_model_run(line_sim):
    g = mt.gelmandiag(line_sim).value[:, 0, 0]
    assert np.all(g < 1.2)


# -- geweke ------------------------------------------------------------------

def test_geweke_stationary_series():
    rng = np.random.default_rng(1)
    z, p = gewekediag_vec(rng.normal(0, 1, 4000))
    assert abs(z) < 3.5 and 0.0 <= p <= 1.0


def test_geweke_trending_series_fails():
    x = np.linspace(0, 5, 4000) + np.random.default_rng(2).normal(0, 0.5, 4000)
    z, p = gewekediag_vec(x)
    assert abs(z) > 3 and p < 0.01


def test_geweke_bad_windows():
    with pytest.raises(ValueError):
        gewekediag_vec(np.ones(100), first=0.6, last=0.6)


def test_geweke_table(line_sim):
    t = mt.gewekediag(line_sim)
    assert t.colnames == ["Z-score", "p-value"]
    assert t.value.shape == (3, 2, 3)


# -- heidelberger-welch ------------------------------------------------------

def test_pcramer_monotone_cdf():
    q = np.array([0.05, 0.2, 0.5, 1.0, 2.0])
    v = np.array([pcramer(x) for x in q])
    assert np.all(np.diff(v) > 0) and 0 < v[0] and v[-1] < 1.0001


def test_heidel_stationary_passes():
    rng = np.random.default_rng(3)
    burn, conv, p, mean, hw, passed = heideldiag_vec(rng.normal(5, 0.5, 4000))
    assert conv and p > 0.05 and abs(mean - 5) < 0.1 and passed


def test_heidel_table(line_sim):
    t = mt.heideldiag(line_sim)
    assert t.colnames[:3] == ["Burn-in", "Stationarity", "p-value"]
    # stationarity flags are 0/1
    assert set(np.unique(t.value[:, 1, :])) <= {0.0, 1.0}


# -- raftery-lewis -----------------------------------------------------------

def test_raftery_iid():
    rng = np.random.default_rng(4)
    kthin, burnin, total, nmin, dep = rafterydiag_vec(rng.normal(0, 1, 5000))
    assert kthin == 1 and nmin == 3746 and 0.5 < dep < 3.0


def test_raftery_too_short_warns_nan():
    out = rafterydiag_vec(np.random.default_rng(5).normal(0, 1, 100))
    assert np.isnan(out[0]) and out[3] == 3746


def test_raftery_table(line_sim):
    # default q/r needs nmin=3746 draws; 750 stored -> NaN (reference warns)
    t = mt.rafterydiag(line_sim)
    assert t.colnames[-1] == "Dependence Factor"
    assert np.all(np.isnan(t.value[:, 4, :]))
    # achievable precision spec on the same run gives finite estimates
    t2 = mt.rafterydiag(line_sim, q=0.5, r=0.05)
    assert np.all(t2.value[:, 4, :] > 0)


# -- model-based stats -------------------------------------------------------

def test_logpdf_chains(line_sim):
    lp = mt.logpdf_chains(line_sim)
    assert lp.names == ["logpdf"]
    assert lp.value.shape == (line_sim.niter, 1, 3)
    assert np.all(np.isfinite(lp.value))
    # should equal direct evaluation for the last stored draw
    cm = line_sim.compiled


def test_dic(line_sim):
    d = mt.dic(line_sim)
    assert d.rownames == ["pD", "pV"]
    dic_pd = d.value[0, 0, 0]
    # line model: ~3 effective parameters, deviance around 10-20
    assert 5 < dic_pd < 40
    assert 0 < d.value[0, 1, 0] < 10


def test_predict(line_sim):
    pr = mt.predict(line_sim)
    assert pr.names == [f"y[{i}]" for i in range(1, 6)]
    m = pr.value.mean(axis=(0, 2))
    np.testing.assert_allclose(m, [1.4, 2.2, 3.0, 3.8, 4.6], atol=0.8)
    with pytest.raises(ValueError):
        mt.predict(line_sim, ["beta"])


# -- file I/O ----------------------------------------------------------------

def test_write_read_roundtrip(tmp_path, line_sim):
    path = os.path.join(tmp_path, "sim.pkl")
    mt.write_chains(path, line_sim)
    c = mt.read_chains(path)
    np.testing.assert_array_equal(c.value, line_sim.value)
    assert c.names == line_sim.names and c.start == line_sim.start


def test_read_restartable(tmp_path, line_sim):
    path = os.path.join(tmp_path, "sim.pkl")
    mt.write_chains(path, line_sim)
    model, inputs, _ = line.build()
    mc = mt.read_chains(path, model=model, inputs=inputs)
    sim2 = mt.mcmc(mc, 100)
    assert sim2.niter == line_sim.niter + 50
    np.testing.assert_array_equal(sim2.value[:line_sim.niter], line_sim.value)


def test_readcoda(tmp_path):
    # synthesize a 2-variable CODA pair
    it = np.arange(1, 101)
    a = np.sin(it / 10.0)
    b = np.cos(it / 10.0)
    out = os.path.join(tmp_path, "coda1.txt")
    ind = os.path.join(tmp_path, "codaIndex.txt")
    with open(out, "w") as f:
        for i, v in zip(it, a):
            f.write(f"{i}  {v:.6f}\n")
        for i, v in zip(it, b):
            f.write(f"{i}  {v:.6f}\n")
    with open(ind, "w") as f:
        f.write("alpha 1 100\nbeta 101 200\n")
    c = mt.readcoda(out, ind)
    assert c.names == ["alpha", "beta"]
    assert c.value.shape == (100, 2, 1)
    np.testing.assert_allclose(c.value[:, 0, 0], a, atol=1e-6)
    np.testing.assert_allclose(c.value[:, 1, 0], b, atol=1e-6)


# -- split-chain rank-normalized ESS / R-hat (Vehtari et al. 2021) -----------

def ar1_chains(rho, n=20000, m=4, p=1, seed=1):
    """AR(1) with unit innovations: true ESS/N = (1-rho)/(1+rho)."""
    rng = np.random.default_rng(seed)
    eps = rng.normal(0, 1, (n, p, m))
    x = np.empty_like(eps)
    x[0] = eps[0] / np.sqrt(1 - rho ** 2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    return x


def test_ess_bulk_ar1_known_value():
    from mamba_tpu.output import ess_bulk
    for rho in (0.5, 0.9):
        v = ar1_chains(rho)
        n_total = v.shape[0] * v.shape[2]
        got = ess_bulk(v)[0]
        want = n_total * (1 - rho) / (1 + rho)
        assert abs(got - want) / want < 0.15, (rho, got, want)


def test_ess_bulk_iid_near_total():
    from mamba_tpu.output import ess_bulk
    c = iid_chains(n=4000, p=3, m=8)
    ess = ess_bulk(np.asarray(c.value))
    n_total = 4000 * 8
    assert np.all(ess > 0.8 * n_total)
    # honest estimator: no silent cap at per-chain length
    assert np.all(ess > 4000)


def test_ess_not_capped_at_per_chain_rows():
    """Regression for the round-1 bench bug: with many chains the pooled
    (sd/mcse)^2 ESS capped at per-chain kept rows, making ESS/s vacuous."""
    from mamba_tpu.output import summarystats
    c = iid_chains(n=500, p=2, m=64)
    s = summarystats(c).to_dict()
    for k in ("x0", "x1"):
        assert s[k]["ESS"] > 500 * 4  # far beyond the old per-chain cap


def test_rhat_rank_detects_shift_and_trend():
    from mamba_tpu.output import rhat_rank
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, (2000, 1, 4))
    assert rhat_rank(v)[0] < 1.01
    v_shift = v.copy()
    v_shift[:, 0, 0] += 3.0          # one stuck chain
    assert rhat_rank(v_shift)[0] > 1.2
    v_trend = v + np.linspace(0, 3, 2000)[:, None, None]  # within-chain trend
    assert rhat_rank(v_trend)[0] > 1.2


def test_ess_tail_and_table(line_sim):
    from mamba_tpu.output import ess_rhat, ess_tail
    t = ess_rhat(line_sim)
    assert t.value.shape[1] == 3
    assert np.all(t.value[:, 2] < 1.1)          # converged line model
    assert np.all(t.value[:, 0] > 100)          # bulk ESS
    et = ess_tail(np.asarray(line_sim.value))
    assert np.all(et > 50)


def test_ess_constant_param_nan():
    from mamba_tpu.output import ess_bulk, rhat_rank
    v = np.ones((1000, 1, 4))
    assert np.isnan(ess_bulk(v)[0])
    assert np.isnan(rhat_rank(v)[0])
