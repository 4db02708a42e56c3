"""One-off lab: fused-GLMM gradient accuracy at near-mode vs dispersed states.

Reproduces the BENCH_r04 / KERNEL_LAB contradiction (grad_max_rel_err 0.11 vs
0.002): the lab probed dispersed random states where |grad| is huge, the bench
probes post-warmup states where the gbeta contraction cancels and the bf16 MXU
product error dominates.  Then A/Bs the candidate fixes for both accuracy and
speed at the stretch config.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C, P, n, G = 1024, 4, 10, 10_000
GP = -(-G // 128) * 128


def _data(mode):
    rng = np.random.default_rng(0)
    Xt = rng.normal(0, 1, (P, n, GP))
    y = (rng.random((n, GP)) < 0.5).astype(float)
    if mode == "dispersed":
        betas = rng.normal(0, 0.5, (C, P))
        bs = rng.normal(0, 0.7, (C, GP))
    else:  # near-mode: y is coin flips independent of X -> mode at ~0
        betas = rng.normal(0, 0.01, (C, P))
        bs = rng.normal(0, 0.01, (C, GP))
    Xt[:, :, G:] = 0.0
    y[:, G:] = 0.0
    bs[:, G:] = 0.0
    return (jnp.asarray(Xt, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(betas, jnp.float32), jnp.asarray(bs, jnp.float32))


def scale_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6))


def run():
    from mamba_tpu.ops import fused_glmm as FG
    from mamba_tpu.utils.timing import time_compiled

    def ref(Xt, y, betas, bs):
        def one(beta, b):
            def lp(be, bb):
                l = jnp.einsum("pig,p->ig", Xt[:, :, :G], be) + bb[None, :G]
                return jnp.sum(y[:, :G] * l - jax.nn.softplus(l))
            return jax.value_and_grad(lp, argnums=(0, 1))(beta, b)
        return jax.jit(jax.vmap(one))(betas, bs)

    out = {}
    jf = jax.jit(lambda Xt, y, betas, bs: FG._fused_call_batched(
        Xt, y, betas, bs, G=G))
    for mode in ("dispersed", "near_mode"):
        Xt, y, betas, bs = _data(mode)
        vf, (gbeta_f, gb_f) = ref(Xt, y, betas, bs)
        lp_s, gbeta_s, gb_s = jf(Xt, y, betas, bs)
        out[mode] = {
            "ref_gbeta_maxabs": float(np.max(np.abs(gbeta_f))),
            "gbeta_scale_err": scale_err(gbeta_s, gbeta_f),
            "gb_scale_err": scale_err(gb_s[:, :G], gb_f[:, :G]),
            "lp_rel_err": float(np.max(np.abs((lp_s - vf) / vf))),
        }
        s = time_compiled(jf, Xt, y, betas, bs, iters=30)
        out[mode]["us"] = round(s * 1e6, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    run()
