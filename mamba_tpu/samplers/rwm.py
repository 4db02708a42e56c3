"""Random-walk Metropolis (reference: src/samplers/rwm.jl)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import SamplerSpec, metropolis_accept


class RWMTune(NamedTuple):
    scale: jax.Array  # scalar or per-coordinate


def rwm_init(x0, scale) -> RWMTune:
    return RWMTune(scale=jnp.asarray(scale, jnp.asarray(x0).dtype))


def rwm_step(key, x, tune: RWMTune, logf, proposal: str = "normal"):
    """One MH step with symmetric proposal (reference rwm.jl:65-71).
    ``proposal``: 'normal' or 'uniform' (SymUniform), mirroring the
    reference's SymDistributionType argument."""
    kp, ka = jax.random.split(key)
    if proposal == "uniform":
        z = jax.random.uniform(kp, x.shape, x.dtype, -1.0, 1.0)
    else:
        z = jax.random.normal(kp, x.shape, x.dtype)
    y = x + tune.scale * z
    x2, _ = metropolis_accept(ka, logf(y) - logf(x), y, x)
    return x2, tune


class RWM(SamplerSpec):
    """RWM(params, scale; proposal='normal') — samples in link-transformed
    space (reference rwm.jl:49-58 uses SamplingBlock(…, true))."""

    transform = True

    def __init__(self, params, scale, proposal: str = "normal"):
        super().__init__(params)
        self.scale = scale
        self.proposal = proposal

    def kernel_init(self, key, x0, logf):
        return rwm_init(x0, self.scale)

    def kernel_step(self, key, x, tune, logf, adapt):
        return rwm_step(key, x, tune, logf, proposal=self.proposal)
