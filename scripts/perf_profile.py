"""Kernel-level performance profile -> PERF.json (basis of docs/perf.md).

For the two bench configs (rats @1024 chains, GLMM-10k @256 chains) this
measures, on the current device, the achieved FLOP/s and HBM bytes/s of the
compute-path functions the engine actually runs hot:

- ``grad``   — fused value_and_grad of the NUTS block log density over all
               chains: the inner loop of every leapfrog step.
- ``logf``   — the block log density alone (slice/MH kernels evaluate this).
- ``gibbs``  — one full Gibbs iteration (all sampler blocks).  NUTS hides a
               data-dependent ``while_loop`` whose trip count XLA's static
               cost analysis counts once, so its FLOP numbers undercount;
               wall time and bytes/s are still meaningful.
- ``amwg``   — the AMWG coordinate sweep on the rats reference scheme (the
               reference's per-coordinate serial loop; the candidate the
               VERDICT names for a Pallas prototype).

Run:  PYTHONPATH=.:/root/.axon_site python scripts/perf_profile.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _kernels_for(model, cm):
    return [s.build(cm) for s in model.samplers]


def _stacked_state(cm, inits, chains):
    state = {}
    for n in cm.stochastic:
        v = np.broadcast_to(np.asarray(inits[n], dtype=np.float64),
                            cm.sites[n].shape)
        state[n] = jnp.asarray(np.broadcast_to(v, (chains,) + v.shape),
                               cm.dtype)
    return state


def profile_config(name, model, inputs, inits, chains, nuts_block=0):
    from mamba_tpu.model.compile import compile_model
    from mamba_tpu.utils.roofline import roofline

    cm = compile_model(model, inputs, inits)
    kernels = _kernels_for(model, cm)
    state = _stacked_state(cm, inits, chains)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(chains))
    tunes = jax.jit(jax.vmap(lambda k, s: tuple(
        kr.init(k, s) for kr in kernels), axis_name="chains"))(keys, state)

    out = {"chains": chains}

    params = tuple(model.samplers[nuts_block].params)
    pack, _, _, logf = cm.block_functions(params, True)
    flat = jax.jit(jax.vmap(pack))(state)
    out["block_dim"] = int(flat.shape[-1])

    grad_fn = jax.vmap(lambda v, st: jax.value_and_grad(logf)(v, st))
    out["grad"] = roofline(grad_fn, flat, state, iters=30)
    out["logf"] = roofline(jax.vmap(logf), flat, state, iters=30)

    def gibbs(key, state, tunes):
        new = []
        for i, k in enumerate(kernels):
            key, sub = jax.random.split(key)
            state, t = k.step(sub, state, tunes[i], jnp.asarray(False))
            new.append(t)
        return key, state, tuple(new)

    out["gibbs"] = roofline(
        jax.vmap(gibbs, axis_name="chains"), keys, state, tunes, iters=10)
    return out


def main():
    import mamba_tpu  # noqa: F401  (path check)
    from mamba_tpu.models import glmm, rats
    from mamba_tpu.utils.roofline import device_peaks

    res = {"device": str(jax.devices()[0]),
           "peaks": dict(zip(("flops_s", "hbm_bytes_s"), device_peaks()))}

    model, inputs, inits = rats.build("nuts")
    res["rats_nuts_1024c"] = profile_config(
        "rats", model, inputs, inits[0], chains=1024)

    # reference scheme: Slice + AMWG — profile the AMWG coordinate sweep
    model_r, inputs_r, inits_r = rats.build("reference")
    from mamba_tpu.model.compile import compile_model
    from mamba_tpu.utils.roofline import roofline
    cm_r = compile_model(model_r, inputs_r, inits_r[0])
    amwg_idx = [i for i, s in enumerate(model_r.samplers)
                if type(s).__name__ == "AMWG"]
    if amwg_idx:
        kern = model_r.samplers[amwg_idx[0]].build(cm_r)
        chains = 1024
        state = _stacked_state(cm_r, inits_r[0], chains)
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.key(0), i))(jnp.arange(chains))
        tune = jax.jit(jax.vmap(kern.init, axis_name="chains"))(keys, state)
        step = jax.vmap(lambda k, s, t: kern.step(k, s, t, jnp.asarray(False)),
                        axis_name="chains")
        res["rats_amwg_sweep_1024c"] = roofline(step, keys, state, tune,
                                                iters=10)

    model_g, inputs_g, inits_g, _ = glmm.build(10_000)
    res["glmm10k_nuts_256c"] = profile_config(
        "glmm", model_g, inputs_g, inits_g[0], chains=256)

    # A/B: the fused Pallas likelihood+grad kernel (ops/fused_glmm.py)
    # against the generic-XLA build above, same chains, same block
    model_f, inputs_f, inits_f, _ = glmm.build(10_000, fused=True)
    res["glmm10k_nuts_256c_fused_pallas"] = profile_config(
        "glmm-fused", model_f, inputs_f, inits_f[0], chains=256)

    path = os.path.join(ROOT, "PERF.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
