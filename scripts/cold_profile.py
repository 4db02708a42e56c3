"""Cold-start breakdown of the bench flagship (rats @1024 chains) -> stdout.

Splits the bench's ``cold_s`` into its actual phases so compile-time work
targets the biggest term (r3 verdict #5: cold went 51s -> 557s -> 105s
across rounds with no committed accounting of where the seconds live):

- import            — package import (incl. JAX backend init)
- compile_model     — model trace + example forward pass
- init_tunes        — jit of per-chain tune init (incl. the nutsepsilon
                      doubling-search while_loop)
- trace_warm        — jaxpr trace of the warmup scan (pure Python/JAX)
- compile_warm      — XLA compile of the warmup scan (or persistent-cache
                      load; run once with MAMBA_TPU_NO_CACHE=1 for the
                      true compile and once without for the cache-hit path)
- trace_kept        — trace of the kept-draw scan
- compile_kept      — XLA compile of the kept-draw scan
- execute           — one full 1000-iteration run after everything is
                      compiled (the steady-state cost)

Run:  PYTHONPATH=.:/root/.axon_site python scripts/cold_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAINS = 1024
ITERS = 1000
BURNIN = 300


def main():
    out = {"chains": CHAINS, "iters": ITERS, "burnin": BURNIN,
           "cache_enabled": not os.environ.get("MAMBA_TPU_NO_CACHE")}
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    import mamba_tpu as mt
    from mamba_tpu.model.mcmc import CHAIN_AXIS, _chain_inits
    from mamba_tpu.models import rats
    out["import_s"] = round(time.time() - t0, 2)
    out["device"] = str(jax.devices()[0])

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

    def warm_only(key, state, tunes):
        def warm(c, _):
            key, state, tunes = c
            return gibbs_iter(key, state, tunes, jnp.asarray(True)), None
        return jax.lax.scan(warm, (key, state, tunes), length=BURNIN)[0]

    def kept_chunk(key, state, tunes):
        def kept(c, _):
            c = gibbs_iter(*c, jnp.asarray(False))
            return c, pack_monitored(c[1])
        (key, state, tunes), rows = jax.lax.scan(
            kept, (key, state, tunes), length=ITERS - BURNIN)
        return key, state, tunes, rows

    wjit = jax.jit(jax.vmap(warm_only, axis_name=CHAIN_AXIS))
    t0 = time.time()
    lowered = wjit.lower(keys, state0, tunes0)
    out["trace_warm_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    wexec = lowered.compile()
    out["compile_warm_s"] = round(time.time() - t0, 2)

    kjit = jax.jit(jax.vmap(kept_chunk, axis_name=CHAIN_AXIS))
    t0 = time.time()
    lowered = kjit.lower(keys, state0, tunes0)
    out["trace_kept_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    kexec = lowered.compile()
    out["compile_kept_s"] = round(time.time() - t0, 2)

    from mamba_tpu.utils.timing import device_sync
    t0 = time.time()
    carry = wexec(keys, state0, tunes0)
    key_f, state_f, tunes_f, rows = kexec(*carry)
    device_sync(rows)
    out["execute_s"] = round(time.time() - t0, 2)
    out["total_s"] = round(sum(v for k, v in out.items()
                               if k.endswith("_s")), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
