"""Fused-GLMM kernel lab: honest floor analysis for the hot kernel.

All timings use the queue-drain barrier (utils/timing.py) — r02's numbers
were measured with ``block_until_ready``, which is not a barrier on this
runtime, so this lab re-establishes ground truth before optimizing.

Measured, at the GLMM stretch config (C=1024 chains, P=4, n=10, G=10k):

- ``exp_pass``        — empirical fp32 VPU elementwise ceiling over the same
                        element count the kernel touches (C*n*Gp).
- ``copy_pass``       — empirical HBM bandwidth ceiling (read+write).
- ``shipped_f32``     — the fused Pallas value+grad kernel as shipped.
- ``xla_generic_f32`` — vmapped ``value_and_grad`` of the plain-XLA formula
                        (the A/B baseline the engine uses when fused=False).
- ``xla_generic_bf16``— same with bf16 logits/intermediates, f32 accumulation
                        (VERDICT r2 task 6: measured bf16 go/no-go).
- ``floor``           — byte-accounting traffic floor and VPU-pass floor.

Writes KERNEL_LAB.json at the repo root; docs/perf.md summarizes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

C, P, n, G = 1024, 4, 10, 10_000
GP = -(-G // 128) * 128          # lane-padded group count


def _data(dtype=jnp.float32, scale=0.5):
    """``scale`` sets the state dispersion: 0.5 = far-from-mode (huge
    gradients), 0.01 = near-mode (the signed gradient sums cancel ~100x
    below the |term|-sum scale — the regime that exposed the r4 bf16
    contraction noise at real post-warmup chain states)."""
    rng = np.random.default_rng(0)
    Xt = rng.normal(0, 1, (P, n, GP))
    y = (rng.random((n, GP)) < 0.5).astype(float)
    betas = rng.normal(0, scale, (C, P))
    bs = rng.normal(0, 1.4 * scale, (C, GP))
    # caller contract (ops/fused_glmm.py kernel docstring): pad lanes
    # carry ZEROED Xt/y/b — the engine's _pad_lanes guarantees this; a
    # violation shows up as exactly the pad-lane garbage this lab's r4
    # accuracy check once mismeasured as "kernel error"
    Xt[:, :, G:] = 0.0
    y[:, G:] = 0.0
    bs[:, G:] = 0.0
    return (jnp.asarray(Xt, dtype), jnp.asarray(y, dtype),
            jnp.asarray(betas, dtype), jnp.asarray(bs, dtype))


def run():
    from mamba_tpu.ops import fused_glmm as FG
    from mamba_tpu.utils.timing import time_chained, time_compiled
    from mamba_tpu.utils.roofline import device_peaks

    peak_f, peak_b = device_peaks()
    results = {"config": {"C": C, "P": P, "n": n, "G": G},
               "device": str(jax.devices()[0]),
               "timing": "queue-drain barrier (utils/timing.py)"}

    # --- empirical ceilings -------------------------------------------------
    elems = C * n * GP
    x = jnp.ones((elems // 128, 128), jnp.float32)
    s = time_chained(lambda x: jnp.exp(-jnp.abs(x)) * 0.5 + x, x, iters=20)
    results["exp_pass"] = {"us": round(s * 1e6, 1),
                           "gelems_s": round(elems / s / 1e9, 2)}
    s = time_chained(lambda x: x * 1.0001 + 1.0, x, iters=20)
    results["copy_pass"] = {"us": round(s * 1e6, 1),
                            "gbytes_s": round(2 * x.nbytes / s / 1e9, 1)}

    # --- byte-accounting floor ---------------------------------------------
    f32 = 4
    in_bytes = (P * n * GP + n * GP + C * P + C * GP) * f32
    out_bytes = (C + C * P + C * GP) * f32
    floor_us = (in_bytes + out_bytes) / (peak_b or 819e9) * 1e6
    results["floor"] = {
        "hbm_bytes": in_bytes + out_bytes,
        "hbm_floor_us_at_peak": round(floor_us, 1),
        "note": "Xt/y once + per-chain (beta,b) in, (lp,gbeta,gb) out",
    }

    # --- the shipped fused kernel -------------------------------------------
    Xt, y, betas, bs = _data()

    def shipped(Xt, y, betas, bs):
        return FG._fused_call_batched(Xt, y, betas, bs, G=G)

    jf = jax.jit(shipped)
    s = time_compiled(jf, Xt, y, betas, bs, iters=30)
    results["shipped_f32"] = {
        "us": round(s * 1e6, 1),
        "gbytes_s_vs_floor": round((in_bytes + out_bytes) / s / 1e9, 1),
    }

    # --- generic XLA A/B, f32 and bf16-compute ------------------------------
    def make_xla(compute_dtype, precision=None):
        def one(Xt, y, beta, b):
            def lp(be, bb):
                Xc = Xt[:, :, :G].astype(compute_dtype)
                l = jnp.einsum("pig,p->ig", Xc, be.astype(compute_dtype),
                               precision=precision)
                l = l + bb[:G].astype(compute_dtype)[None, :]
                t = (y[:, :G] * l.astype(jnp.float32)
                     - jax.nn.softplus(l).astype(jnp.float32))
                return jnp.sum(t)
            return jax.value_and_grad(lp, argnums=(0, 1))(beta, b)
        return jax.jit(jax.vmap(one, in_axes=(None, None, 0, 0)))

    HI = jax.lax.Precision.HIGHEST
    for name, dt, prec in (("xla_generic_f32", jnp.float32, HI),
                           ("xla_generic_bf16", jnp.bfloat16, None)):
        f = make_xla(dt, prec)
        s = time_compiled(f, Xt, y, betas, bs, iters=30)
        results[name] = {"us": round(s * 1e6, 1)}

    def scale_err(a, b):
        # max |diff| normalized by the reference's own magnitude scale —
        # elementwise relative error is meaningless where a 10k-term
        # gradient component happens to cancel near zero
        a, b = np.asarray(a), np.asarray(b)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6))

    # --- gradient accuracy vs an EXACT reference, in BOTH state regimes -----
    # The r4 lab compared against a default-precision einsum whose own MXU
    # backward contraction is bf16 — i.e. two noisy measurements of each
    # other — and probed only dispersed states whose huge gradient scale hid
    # the absolute noise (BENCH_r04 then found 0.11 at real post-warmup
    # states).  The reference here is Precision.HIGHEST (exact f32
    # contraction); near-mode states are the hard regime.
    exact_fn = make_xla(jnp.float32, HI)
    default_fn = make_xla(jnp.float32, None)
    acc = {}
    worst = 0.0
    for label, sc in (("dispersed", 0.5), ("near_mode", 0.01)):
        Xa, ya, betasa, bsa = _data(scale=sc)
        ve = exact_fn(Xa, ya, betasa, bsa)
        vd = default_fn(Xa, ya, betasa, bsa)
        lp_s, gbeta_s, gb_s = jf(Xa, ya, betasa, bsa)
        lp_err = float(jnp.max(jnp.abs((lp_s - ve[0]) / ve[0])))
        gbeta_err = scale_err(gbeta_s, ve[1][0])
        gb_err = scale_err(gb_s[:, :G], ve[1][1][:, :G])
        acc[label] = {
            "grad_scale": round(float(jnp.max(jnp.abs(ve[1][0]))), 1),
            "shipped_lp_max_rel_err": round(lp_err, 6),
            "shipped_gbeta_err_vs_grad_scale": round(gbeta_err, 6),
            "shipped_gb_err_vs_grad_scale": round(gb_err, 6),
            # the default-precision einsum's own error, for context: this
            # is what the engine would ship with a naive fused=False build
            # (models/glmm.py now forces HIGHEST on that contraction too)
            "xla_default_prec_gbeta_err": round(
                scale_err(vd[1][0], ve[1][0]), 6),
        }
        worst = max(worst, lp_err, gbeta_err, gb_err)
    acc["ok_at_1e-2"] = bool(worst < 1e-2)
    results["grad_accuracy_vs_exact"] = acc
    assert acc["ok_at_1e-2"], acc

    print(json.dumps(results, indent=1))
    with open(os.path.join(ROOT, "KERNEL_LAB.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    run()
