"""Roofline measurement: achieved FLOP/s and HBM bytes/s of a compiled
function vs the chip's peaks.

The reference has no profiling at all (SURVEY.md §5); the north star for
this rebuild is "speed-of-light log-prob throughput per chip", which needs
an actual fraction-of-peak number.  XLA's compiled cost analysis provides
static FLOP and bytes-accessed counts for a compiled executable; dividing
by measured wall time per call gives achieved rates.  For MCMC log-density
kernels the relevant ceiling is nearly always HBM bandwidth (elementwise
likelihood math over large observation arrays), so ``pct_hbm`` is the
headline number; ``pct_flops`` is reported for completeness.

Peaks are per-chip datasheet values for the device kinds this project
runs on (TPU v5e: 197 TFLOP/s bf16 MXU, 819 GB/s HBM).
"""

from __future__ import annotations

import jax
import numpy as np

#: device_kind -> (peak FLOP/s, peak HBM bytes/s)
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),     # v5e datasheet
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),    # v6e (Trillium)
}


def device_peaks(device=None):
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for k, v in PEAKS.items():
        if k.lower() in kind.lower():
            return v
    return (None, None)


def _result_device(out):
    """Device the compiled call actually ran on (first output buffer)."""
    for leaf in jax.tree_util.tree_leaves(out):
        devs = getattr(leaf, "devices", None)
        if callable(devs):
            ds = list(devs())
            if ds:
                return ds[0]
    return None


def vpu_elementwise_ceiling(n_elems: int = 64 * 1024 * 1024,
                            iters: int = 20) -> dict:
    """Measured ceiling for fp32 transcendental-heavy elementwise code: a
    fused exp+add pass over ``n_elems`` VMEM-tiled floats, reporting achieved
    elements/s.  The datasheet FLOP/s peak is the *bf16 MXU* number — fp32
    VPU likelihood kernels top out 2-3 orders of magnitude below it, so this
    empirical number is the honest 'speed of light' to compare elementwise
    log-density kernels against (ADVICE r2: don't divide VPU FLOPs by the
    MXU peak and call the kernel latency-bound)."""
    import jax.numpy as jnp
    from .timing import time_chained
    x = jnp.ones((n_elems // 128, 128), jnp.float32)
    s = time_chained(lambda x: jnp.exp(-jnp.abs(x)) + x, x, iters=iters)
    return {"s_per_call": s, "elems": n_elems,
            "gelems_s": round(n_elems / s / 1e9, 2)}


def _cost_analysis(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return {}
    if isinstance(ca, (list, tuple)):   # older jax returns [dict]
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def roofline(fn, *args, iters: int = 20, warmup: int = 3) -> dict:
    """Compile ``fn(*args)``, time it warm, and report achieved rates vs
    the device's peak FLOP/s and HBM bandwidth.

    Returns keys: s_per_call, flops, bytes, gflops_s, gbytes_s, pct_flops,
    pct_hbm, bound ('memory' | 'compute' | 'latency' | 'unknown').
    """
    from .timing import time_compiled
    jfn = jax.jit(fn)
    compiled = jfn.lower(*args).compile()
    ca = _cost_analysis(compiled)
    flops = float(ca.get("flops", 0.0) or 0.0)
    nbytes = float(ca.get("bytes accessed", 0.0) or 0.0)

    # queue-drain-synced timing: block_until_ready is NOT a barrier on the
    # tunneled TPU runtime (see utils/timing.py) — the r02 PERF numbers
    # measured with it are superseded by these
    s = time_compiled(compiled, *args, iters=iters, warmup=warmup)
    out = compiled(*args)

    peak_f, peak_b = device_peaks(_result_device(out))
    gf = flops / s / 1e9 if flops else 0.0
    gb = nbytes / s / 1e9 if nbytes else 0.0
    pct_f = 100.0 * flops / s / peak_f if (flops and peak_f) else np.nan
    pct_b = 100.0 * nbytes / s / peak_b if (nbytes and peak_b) else np.nan
    if np.isnan(pct_f) and np.isnan(pct_b):
        bound = "unknown"
    elif max(np.nan_to_num(pct_f), np.nan_to_num(pct_b)) < 2.0:
        bound = "latency"       # far off both rooflines: dispatch/latency
    elif np.nan_to_num(pct_b) >= np.nan_to_num(pct_f):
        bound = "memory"
    else:
        bound = "compute"
    res = {
        "s_per_call": s, "flops": flops, "bytes": nbytes,
        "gflops_s": round(gf, 2), "gbytes_s": round(gb, 2),
        "pct_flops": None if np.isnan(pct_f) else round(pct_f, 2),
        "pct_hbm": None if np.isnan(pct_b) else round(pct_b, 2),
        "bound": bound,
        # convention note (ADVICE r2): the FLOP peak is the bf16 MXU
        # datasheet number; fp32 VPU-heavy elementwise kernels saturate far
        # below it, so a tiny pct_flops does NOT mean latency-bound — compare
        # against vpu_elementwise_ceiling() for such kernels.
        "flops_peak_convention": "bf16 MXU datasheet",
    }
    # XLA's "bytes accessed" counts every operand/result of every fused
    # computation ANALYTICALLY — for well-fused programs the intermediates
    # never leave VMEM, so the count can exceed what HBM could physically
    # serve.  A >100% figure is therefore a fusion artifact, not real
    # utilization (r4 advisor: PERF.json published pct_hbm 140).
    if res["pct_hbm"] is not None and res["pct_hbm"] > 100.0:
        res["pct_hbm_note"] = (
            "analytic bytes exceed measured-feasible HBM traffic; fusion "
            "keeps intermediates on-chip — not real HBM utilization")
    return res
