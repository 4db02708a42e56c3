"""Test configuration: run everything on a virtual 8-device CPU mesh.

The session environment pre-loads the remote-TPU ('axon') JAX plugin via
sitecustomize *at interpreter start*, so JAX is already imported before this
conftest runs and JAX_PLATFORMS env vars are ignored.  We must switch
platforms through jax.config instead.  Real TPU hardware is exercised by
bench.py; the test suite validates numerics + sharding on host CPU (the
reference had no such harness at all — SURVEY.md §4).
"""

import os

# XLA_FLAGS is read lazily when the CPU client is first created, so setting
# it here (before any jax computation) still yields 8 virtual devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
