"""Posterior plots: trace, density, running-mean, autocorrelation, bar,
contour, mixed — with multi-page grid drawing.

TPU-native counterpart of reference src/output/plot.jl (Gadfly engines,
plot.jl:83-226; grid/draw pagination, plot.jl:5-55) rebuilt on matplotlib.
``plot(c)`` returns a list of per-parameter figure-closure specs;
``draw(plots, ...)`` lays them out nrow x ncol per page and writes
svg/png/pdf files (one file per page, ``name-1.svg`` style, like the
reference's auto-extension mode).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from .chains import Chains
from .stats import autocov, cummean_arr

__all__ = ["plot", "draw", "traceplot", "densityplot", "meanplot",
           "autocorplot", "barplot", "contourplot", "mixeddensityplot"]


@dataclasses.dataclass
class PlotSpec:
    title: str
    render: Callable          # (ax) -> None


def _discrete_columns(c: Chains):
    v = c.value
    out = []
    for j in range(c.nparams):
        x = v[:, j, :]
        out.append(np.all(x == np.round(x)) and len(np.unique(x)) <= 25)
    return out


def traceplot(c: Chains, legend: bool = False):
    specs = []
    iters = c.range
    for j, name in enumerate(c.names):
        def render(ax, j=j):
            for k in range(c.nchains):
                ax.plot(iters, c.value[:, j, k], lw=0.5,
                        label=f"chain {c.chains[k]}")
            ax.set_xlabel("Iteration")
            ax.set_ylabel("Value")
            if legend:
                ax.legend(fontsize=6)
        specs.append(PlotSpec(c.names[j], render))
    return specs


def densityplot(c: Chains, legend: bool = False, trim=(0.025, 0.975)):
    specs = []
    for j, name in enumerate(c.names):
        def render(ax, j=j):
            from scipy.stats import gaussian_kde
            for k in range(c.nchains):
                x = c.value[:, j, k]
                lo, hi = np.quantile(x, trim)
                if hi <= lo:
                    ax.axvline(lo, label=f"chain {c.chains[k]}")
                    continue
                grid = np.linspace(lo, hi, 256)
                try:
                    ax.plot(grid, gaussian_kde(x)(grid),
                            label=f"chain {c.chains[k]}")
                except np.linalg.LinAlgError:
                    ax.axvline(x[0], label=f"chain {c.chains[k]}")
            ax.set_xlabel("Value")
            ax.set_ylabel("Density")
            if legend:
                ax.legend(fontsize=6)
        specs.append(PlotSpec(c.names[j], render))
    return specs


def meanplot(c: Chains, legend: bool = False):
    specs = []
    iters = c.range
    for j, name in enumerate(c.names):
        def render(ax, j=j):
            for k in range(c.nchains):
                ax.plot(iters, cummean_arr(c.value[:, j, k]),
                        label=f"chain {c.chains[k]}")
            ax.set_xlabel("Iteration")
            ax.set_ylabel("Mean")
            if legend:
                ax.legend(fontsize=6)
        specs.append(PlotSpec(c.names[j], render))
    return specs


def autocorplot(c: Chains, maxlag: int | None = None, legend: bool = False):
    specs = []
    n = c.niter
    maxlag = maxlag if maxlag is not None else int(round(10 * np.log10(n)))
    lags = np.arange(0, maxlag + 1)
    for j, name in enumerate(c.names):
        def render(ax, j=j):
            for k in range(c.nchains):
                g = autocov(c.value[:, j, k], lags)
                ax.plot(lags * c.thin, g / g[0],
                        label=f"chain {c.chains[k]}")
            ax.axhline(0.0, color="gray", lw=0.5)
            ax.set_xlabel("Lag")
            ax.set_ylabel("Autocorrelation")
            if legend:
                ax.legend(fontsize=6)
        specs.append(PlotSpec(c.names[j], render))
    return specs


def barplot(c: Chains, legend: bool = False, position: str = "stack"):
    specs = []
    for j, name in enumerate(c.names):
        def render(ax, j=j):
            width = 1.0 / c.nchains if position == "dodge" else 1.0
            bottoms = {}
            for k in range(c.nchains):
                x = c.value[:, j, k]
                levels, counts = np.unique(x, return_counts=True)
                props = counts / len(x)
                offs = (k - (c.nchains - 1) / 2) * width \
                    if position == "dodge" else 0.0
                bots = [bottoms.get(v, 0.0) for v in levels] \
                    if position == "stack" else None
                ax.bar(levels + offs, props, width=width * 0.9, bottom=bots,
                       label=f"chain {c.chains[k]}")
                if position == "stack":
                    for v, p in zip(levels, props):
                        bottoms[v] = bottoms.get(v, 0.0) + p
            ax.set_xlabel("Value")
            ax.set_ylabel("Density")
            if legend:
                ax.legend(fontsize=6)
        specs.append(PlotSpec(c.names[j], render))
    return specs


def contourplot(c: Chains, bins: int = 100):
    """Pairwise joint-density contours (reference contourplot,
    plot.jl:134-160)."""
    specs = []
    for i in range(c.nparams):
        for j in range(i + 1, c.nparams):
            def render(ax, i=i, j=j):
                x = c.value[:, i, :].ravel()
                y = c.value[:, j, :].ravel()
                H, xe, ye = np.histogram2d(x, y, bins=bins)
                ax.contour((xe[:-1] + xe[1:]) / 2, (ye[:-1] + ye[1:]) / 2,
                           H.T)
                ax.set_xlabel(c.names[i])
                ax.set_ylabel(c.names[j])
            specs.append(PlotSpec(f"{c.names[i]} vs {c.names[j]}", render))
    return specs


def mixeddensityplot(c: Chains, legend: bool = False, **kwargs):
    """Bar for discrete-valued parameters, density otherwise
    (plot.jl:202-208)."""
    disc = _discrete_columns(c)
    bars = barplot(c, legend=legend)
    dens = densityplot(c, legend=legend)
    return [bars[j] if disc[j] else dens[j] for j in range(c.nparams)]


_ENGINES = {
    "trace": traceplot, "density": densityplot, "mean": meanplot,
    "autocor": autocorplot, "bar": barplot, "contour": contourplot,
    "mixeddensity": mixeddensityplot,
}


def plot(c: Chains, ptype=("trace", "density"), legend: bool = False,
         **kwargs):
    """Grid of plots: one row per requested type, one column per parameter
    (reference plot, plot.jl:58-67).  Returns a flat row-major list of
    PlotSpecs for ``draw``."""
    if isinstance(ptype, str):
        ptype = [ptype]
    out = []
    for i, pt in enumerate(ptype):
        if pt not in _ENGINES:
            raise ValueError(f"unsupported plot type {pt!r}")
        showlegend = legend and i == len(ptype) - 1
        if pt == "contour":
            out.extend(_ENGINES[pt](c, **kwargs))
        else:
            out.extend(_ENGINES[pt](c, legend=showlegend, **kwargs))
    return out


def draw(plots, fmt: str = "svg", filename: str = "", nrow: int = 3,
         ncol: int = 2, width: float = 8.0, height: float = 8.0):
    """Render PlotSpecs in nrow x ncol pages (reference draw,
    plot.jl:5-55).  Returns the written filenames (or live figures when no
    filename is given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if fmt not in ("svg", "png", "pdf", "ps"):
        raise ValueError(f"unsupported draw format {fmt!r}")
    pp = nrow * ncol
    npages = int(np.ceil(len(plots) / pp))
    outputs = []
    stem, has_ext = filename, "." in filename.rsplit("/", 1)[-1]
    for page in range(npages):
        fig, axes = plt.subplots(nrow, ncol, figsize=(width, height))
        axes = np.atleast_1d(axes).ravel()
        chunk = plots[page * pp: (page + 1) * pp]
        for ax, spec in zip(axes, chunk):
            spec.render(ax)
            ax.set_title(spec.title, fontsize=9)
        for ax in axes[len(chunk):]:
            ax.axis("off")
        fig.tight_layout()
        if filename:
            fname = filename if has_ext and npages == 1 else \
                f"{stem}-{page + 1}.{fmt}"
            fig.savefig(fname, format=fmt)
            plt.close(fig)
            outputs.append(fname)
        else:
            outputs.append(fig)
    return outputs
