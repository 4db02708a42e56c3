"""Device timing that is correct on remote-TPU tunnels.

On the tunneled TPU runtime this project benches on, ``jax.block_until_ready``
returns after *enqueue*, not execution (measured: a 2 GiB-traffic elementwise
pass "completes" in 86 us — 24 TB/s, 30x the v5e HBM datasheet peak), and
device->host transfers cost ~24 ms latency plus ~10 MB/s for bulk data.  Naive
``time() ... block_until_ready()`` loops therefore measure dispatch, and
``np.asarray``-synced loops measure the tunnel.  Correct recipe, used by every
benchmark in this repo:

1. enqueue the calls (dependent or independent — the TPU core executes its
   queue in order),
2. enqueue one tiny on-device reduction of the LAST output,
3. fetch that scalar to the host.  The fetch cannot complete until the queue
   has drained, so it is a true barrier costing one ~24 ms round trip total,
   amortized over the batch.

The reference has no timing utilities at all (SURVEY.md §5 — its only clock
is the progress meter, src/progress.jl:40-59).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _first_elem_sum(*leaves):
    # the summands must REALLY feed the result — a *0.0 here would let XLA
    # drop the dependency and the fetch would no longer be a barrier
    s = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        v = jnp.ravel(leaf)[0]
        if jnp.issubdtype(v.dtype, jnp.complexfloating):
            v = jnp.real(v)
        s = s + v.astype(jnp.float32)
    return s


def device_sync(tree) -> None:
    """True synchronization barrier: block the host until every computation
    enqueued before this call (on the devices holding ``tree``) has executed.

    Enqueues a 1-element reduction over (a few leaves of) ``tree`` and fetches
    the resulting scalar; in-order execution makes the fetch a barrier for the
    whole queue.  Works where ``jax.block_until_ready`` lies (see module
    docstring); costs one host round trip (~24 ms on the tunnel, ~us locally).
    """
    raw = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    leaves = []
    for l in raw:
        if jnp.issubdtype(l.dtype, jnp.number) or l.dtype == jnp.bool_:
            leaves.append(l)
        elif jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key):
            # typed PRNG keys: sync through their uint32 backing data
            leaves.append(jax.random.key_data(l))
    if not leaves:
        # No array to thread the barrier through.  block_until_ready is NOT
        # a barrier on this runtime (module docstring), so falling back to
        # it would silently lose the sync guarantee — fail loudly instead.
        raise ValueError(
            "device_sync: tree contains no numeric/bool/PRNG-key array "
            "leaves to build a queue barrier from")
    # one leaf suffices for the queue barrier; a couple more guard against
    # exotic multi-stream runtimes at negligible cost
    np.asarray(_first_elem_sum(*leaves[:3]))


_SYNC_OVERHEAD_CACHE: dict = {}


def sync_overhead_s() -> float:
    """Measured cost of one device_sync round trip on the default device."""
    backend = jax.default_backend()
    if backend not in _SYNC_OVERHEAD_CACHE:
        x = jnp.ones((8,), jnp.float32)
        device_sync(x)                      # compile _first_elem_sum
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            device_sync(x)
            ts.append(time.perf_counter() - t0)
        _SYNC_OVERHEAD_CACHE[backend] = min(ts)
    return _SYNC_OVERHEAD_CACHE[backend]


def time_compiled(fn, *args, iters: int = 30, warmup: int = 2,
                  max_live_bytes: float = 2e9) -> float:
    """Seconds per call of ``fn(*args)`` (jitted or AOT-compiled), warm.

    Enqueues ``iters`` independent calls then drains the queue with ONE
    device_sync; the measured span minus the sync round trip, divided by
    ``iters``, is the per-call execution time.  Outputs of in-flight calls
    coexist on the device, so the enqueue batch is capped to keep
    ``iters * output_bytes`` under ``max_live_bytes`` (a flood of large
    live outputs can OOM the device mid-queue).
    """
    out = fn(*args)
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    device_sync(out)
    out_bytes = sum(getattr(l, "nbytes", 0)
                    for l in jax.tree_util.tree_leaves(out))
    chunk = iters
    if out_bytes > 0:
        chunk = max(1, min(iters, int(max_live_bytes // max(out_bytes, 1))))
    overhead = sync_overhead_s()
    done = 0
    total = 0.0
    while done < iters:
        n = min(chunk, iters - done)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        device_sync(out)
        total += time.perf_counter() - t0 - overhead
        done += n
    if total <= 0:
        # kernel cheaper than one sync round trip's jitter: the measurement
        # is meaningless, not "~0 s" (r3 advisor) — tell the caller.
        import warnings
        warnings.warn(
            f"time_compiled: measured span ({total + overhead:.2e}s for "
            f"{iters} calls) is within the sync overhead ({overhead:.2e}s); "
            f"result is below measurement resolution. Increase iters or use "
            f"time_chained.", RuntimeWarning, stacklevel=2)
        return max(total, 1e-12) / iters
    return total / iters


def time_chained(step, carry, iters: int = 30, warmup: int = 2) -> float:
    """Seconds per call of a shape-preserving ``carry -> carry`` step,
    timed as ``iters`` *dependent* applications inside one jitted loop with a
    dynamic trip count (so one compile serves every ``iters``), synced by a
    scalar fetch.  Use when the op's cost could be hidden by inter-call
    parallelism or when per-dispatch overhead must be excluded entirely."""
    @jax.jit
    def run(k, carry):
        out = jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.ravel(l)[0].astype(jnp.float32)
                   for l in leaves[:3])
    float(run(jnp.asarray(max(1, warmup)), carry))        # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.asarray(1), carry))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(jnp.asarray(iters), carry))
    tk = time.perf_counter() - t0
    return max(tk - t1, 1e-12) / max(iters - 1, 1)
