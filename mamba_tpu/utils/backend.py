"""Trace-time backend detection for loop-formulation selection.

Two loop formulations exist for the NUTS doubling build and the small
univariate-slice coordinate sweep:

- **Trace-time unroll** (static Python loop over levels/coords): the right
  shape for the TPU compiler.  The nested ``scan -> while -> while`` program
  with a traced diagonal mass referenced at every level sends the TPU pass
  pipeline pathological (measured v5e, rats 1024 chains: 574 s cold
  compile; unrolled ~1 min, and slightly faster at runtime).
- **Nested ``lax.while_loop``** (doubling loop as a device loop): the right
  shape for the CPU backend under GSPMD partitioning.  The unrolled
  program's 10 sibling subtree loops, each referencing the sharded
  checkpoint buffers, blow the CPU/GSPMD compile up >200x (11 s -> 35+ min
  on an 8-virtual-device mesh — round-3 verdict, MULTICHIP_r03).

Neither backend compiles both shapes well, so the formulation is selected
at trace time from ``jax.default_backend()``.  Both were proven
bit-identical on kept samples in the f540c10 A/B.  Override with
``MAMBA_TPU_UNROLL=0|1`` for A/B measurements.
"""

from __future__ import annotations

import os

import jax


def unroll_loops() -> bool:
    """True when static loops should be unrolled at trace time (TPU),
    False for the ``lax.while_loop`` formulation (CPU/GPU/GSPMD)."""
    env = os.environ.get("MAMBA_TPU_UNROLL")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"
