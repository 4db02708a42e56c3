"""Profiling & tracing utilities.

The reference has no profiler at all (SURVEY.md §5: the only user-facing
timing is the chain progress meter, src/progress.jl).  The TPU rebuild gets
first-class observability: an XLA profiler trace context (viewable in
TensorBoard/Perfetto/xprof) and a lightweight block timer that measures
compiled-kernel wall time with proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "block_timer", "time_compiled", "annotate"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mamba_tpu_trace", host: bool = True):
    """Capture an XLA device trace for everything inside the block:

        with profiling.trace("/tmp/tr"):
            sim = mt.mcmc(model, inputs, inits, 1000, chains=1024)

    Open the produced directory with TensorBoard's profile plugin or
    Perfetto.  ``host=True`` also records host-side Python activity."""
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = 2 if host else 0
    jax.profiler.start_trace(logdir, profiler_options=options)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a trace (shows up in the profiler timeline):
    usable as decorator or context manager."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def block_timer(label: str = "", sink: list | None = None):
    """Wall-clock a block with device synchronization at exit (so async
    dispatch doesn't hide kernel time).  Appends (label, seconds) to
    ``sink`` when given, else prints."""
    from .timing import device_sync

    t0 = time.perf_counter()
    try:
        yield
    finally:
        (jax.effects_barrier if hasattr(jax, "effects_barrier")
         else (lambda: None))()
        # drain any outstanding device work (a real barrier — see
        # utils/timing.py for why block_until_ready is not one here)
        device_sync(jax.numpy.zeros((1,)) + 1.0)
        dt = time.perf_counter() - t0
        if sink is not None:
            sink.append((label, dt))
        else:
            print(f"[mamba_tpu] {label or 'block'}: {dt:.4f}s")


def time_compiled(fn, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Per-call latency (seconds) of a jitted function, measured with a
    queue-drain barrier (utils/timing.py).  One scalar: the barrier is
    amortized over the whole batch of calls rather than paid per call
    (per-call round trips cost ~24 ms on the tunneled TPU runtime and would
    swamp the kernels being measured), so no per-call min exists."""
    from .timing import time_compiled as _tc

    if kwargs:
        f, fargs = (lambda *a: fn(*a, **kwargs)), args
    else:
        f, fargs = fn, args
    return _tc(f, *fargs, iters=iters, warmup=warmup)
