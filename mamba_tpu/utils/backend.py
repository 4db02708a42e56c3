"""Trace-time loop-formulation selection (NUTS doubling build, small
univariate-slice coordinate sweeps).

Two formulations exist, proven bit-identical on kept samples
(tests/test_samplers.py):

- **Nested ``lax.while_loop``** — the default for the NUTS doubling loop
  on every backend.  Barrier-timed A/B at the rats bench config
  (SCALING.json nuts_loop_formulation_ab, v5e, 1024 chains): 58.3k vs
  19.0k samples/s — the unroll executes all ``max_depth`` levels each
  iteration, and the per-level select/freeze of the whole carry
  (checkpoint buffers included) costs ~3x the useful work.  It also
  compiles FASTER cold (60.9 s vs 91.9 s no-cache) now that the flagship
  scheme carries no slice ``while_loop`` blocks, and it is the only
  formulation the 8-device GSPMD/CPU partitioner compiles in seconds
  (the unroll regressed it 11 s -> 35+ min, round-3 verdict).
- **Trace-time unroll** — kept for the small (<=16-coord) univariate
  slice sweep on TPU only: a multi-trip ``fori_loop`` whose body holds
  the shrinkage ``while_loop``, composed after a while-heavy NUTS block
  in the same program, sent the TPU pass pipeline pathological in r2
  (590 s vs 4 s compile).  The NUTS unroll remains available as an
  escape hatch / A-B lever.

Override with ``MAMBA_TPU_UNROLL=0|1`` (applies to both sites) for
measurements.
"""

from __future__ import annotations

import os

import jax


def nuts_unroll() -> bool:
    """True when the NUTS doubling loop should be unrolled at trace time.
    Default False everywhere (see module docstring: the nested
    ``lax.while_loop`` wins ~3x at runtime AND compiles faster cold)."""
    env = os.environ.get("MAMBA_TPU_UNROLL")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


def unroll_loops() -> bool:
    """True when small static sweeps (univariate slice) should be unrolled
    at trace time (TPU), False for the device-loop formulation
    (CPU/GPU/GSPMD)."""
    env = os.environ.get("MAMBA_TPU_UNROLL")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"
