"""Cold-start breakdown of the bench flagship (rats @1024 chains) -> stdout
and COLD.json.

Splits the bench's ``cold_s`` into its actual phases so compile-time work
targets the biggest term (r3 verdict #5 / r4 verdict #6).  Mirrors the r5
engine structure (model/mcmc.py): ONE unified phase program (adapt is a
traced input) serves both warmup and kept chunks, so the cold path compiles
a single big scan instead of the r4 design's two.

- import            — package import (incl. JAX backend init)
- compile_model     — model trace + example forward pass + kernel builds
- chain_inits       — host-side init stacking + device upload
- init_tunes        — jit of per-chain tune init (incl. the nutsepsilon
                      doubling-search while_loop)
- trace_phase       — jaxpr trace + lowering of the unified scan (Python)
- compile_phase     — XLA compile of the unified scan (or persistent-cache
                      load; run once with MAMBA_TPU_NO_CACHE=1 for the
                      true compile and once without for the cache-hit path)
- execute           — one full 1500-iteration run after everything is
                      compiled (the steady-state cost)

Run:  PYTHONPATH=.:/root/.axon_site python scripts/cold_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHAINS = 1024
ITERS = 1500
BURNIN = 500
CHUNK = 500      # bench.py launch_iters


def main():
    out = {"chains": CHAINS, "iters": ITERS, "burnin": BURNIN,
           "cache_enabled": not os.environ.get("MAMBA_TPU_NO_CACHE")}
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mamba_tpu as mt
    from mamba_tpu.model.mcmc import CHAIN_AXIS, _chain_inits
    from mamba_tpu.models import rats
    out["import_s"] = round(time.time() - t0, 2)
    out["device"] = str(jax.devices()[0])

    # First sizeable device interaction pays the remote-TPU (axon)
    # client/tunnel attach — measured 40-204 s across r5 runs when the
    # tunnel was idle, ~1-3 s when hot, and previously mis-attributed to
    # chain_inits.  A tiny scalar op does NOT trigger it; probe with a
    # ~1 MB round-trip so the cost lands here.  Environment cost, not
    # framework work — bench cold_s inherits this variance.
    t0 = time.time()
    x = jnp.ones((256, 1024))           # ~1 MB up
    jax.block_until_ready(x * 2.0)
    _ = np.asarray(x)                   # ~1 MB down
    out["backend_init_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    model, inputs, inits = rats.build("nuts")
    cm = mt.compile_model(model, inputs, inits[0])
    kernels = [s.build(cm) for s in model.samplers]
    out["compile_model_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    state0 = _chain_inits(cm, inits, CHAINS)
    keys = jax.jit(jax.vmap(lambda i: jax.random.fold_in(
        jax.random.key(123), i)))(jnp.arange(CHAINS))
    out["chain_inits_s"] = round(time.time() - t0, 2)

    def init_tunes(key, state):
        return tuple(k.init(key, state) for k in kernels)

    t0 = time.time()
    tunes0 = jax.jit(jax.vmap(init_tunes, axis_name=CHAIN_AXIS))(keys, state0)
    jax.block_until_ready(tunes0)
    out["init_tunes_s"] = round(time.time() - t0, 2)

    _, _, pack_monitored = cm.monitor_spec()

    def gibbs_iter(key, state, tunes, adapt):
        new_tunes = []
        for i, k in enumerate(kernels):
            key, sub = jax.random.split(key)
            state, t = k.step(sub, state, tunes[i], adapt)
            new_tunes.append(t)
        return key, state, tuple(new_tunes)

    # the unified phase program (model/mcmc.py phase_fn): adapt is traced
    def chunk_fn(key, state, tunes, adapt):
        def step(c, _):
            c = gibbs_iter(*c, adapt)
            return c, pack_monitored(c[1])
        (key, state, tunes), rows = jax.lax.scan(
            step, (key, state, tunes), length=CHUNK)
        return key, state, tunes, rows

    pjit = jax.jit(jax.vmap(chunk_fn, axis_name=CHAIN_AXIS,
                            in_axes=(0, 0, 0, None)))
    t0 = time.time()
    lowered = pjit.lower(keys, state0, tunes0, jnp.asarray(True))
    out["trace_phase_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    pexec = lowered.compile()
    out["compile_phase_s"] = round(time.time() - t0, 2)

    from mamba_tpu.utils.timing import device_sync
    t0 = time.time()
    carry = (keys, state0, tunes0)
    for adapt in (True, False, False):      # 500 warm + 1000 kept
        k, s, tn, rows = pexec(*carry, jnp.asarray(adapt))
        carry = (k, s, tn)
    device_sync(rows)
    out["execute_s"] = round(time.time() - t0, 2)
    out["total_s"] = round(sum(v for k, v in out.items()
                               if k.endswith("_s")), 2)
    print(json.dumps(out))
    tag = "cold" if os.environ.get("MAMBA_TPU_NO_CACHE") else "cached"
    path = os.path.join(ROOT, "COLD.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev[tag] = out
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)


if __name__ == "__main__":
    main()
