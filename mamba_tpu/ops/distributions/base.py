"""Distribution protocol: pure-JAX pytree distributions.

TPU-native replacement for the reference's Distributions.jl dependency plus
its DistributionStruct dispatch layer (reference: src/Mamba.jl:67-69,
src/distributions/distributionstruct.jl:14-186).  Where the reference holds
``Array{UnivariateDistribution}`` — one Julia object per observation, looped
over serially — here a single distribution object carries *batched* parameter
arrays and ``log_prob`` evaluates every element in one fused VPU pass.

Conventions
-----------
- Every distribution is a frozen dataclass registered as a pytree; parameter
  fields are (broadcastable) arrays, so distributions can be built inside jit
  from traced values and carried through ``lax.scan``/``vmap``.
- ``event_ndim``: 0 univariate, 1 vector-variate, 2 matrix-variate.
- ``log_prob(x)`` reduces over the event dims only and returns batch-shaped
  values; node-level densities sum the batch.
- ``sample(key, shape)`` prepends ``shape`` to the broadcasted batch shape.
- ``bijector()`` returns the support transform used for unconstrained
  sampling (reference link/invlink, transformdistribution.jl).
- ``in_support(x)`` is the vectorized ``insupport`` check used to mask
  impossible states to -inf (reference: distributionstruct.jl:138-140).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...utils.pytree import register_dataclass_pytree
from .. import bijectors as bij


def distribution(static: tuple[str, ...] = ()):
    """Class decorator: frozen dataclass + pytree registration."""
    def deco(cls):
        cls = dataclasses.dataclass(frozen=True)(cls)
        return register_dataclass_pytree(cls, static_fields=static)
    return deco


class Distribution:
    event_ndim: int = 0
    is_discrete: bool = False

    # ---- shapes -------------------------------------------------------
    @property
    def param_shapes(self):
        return tuple(jnp.shape(getattr(self, f.name))
                     for f in dataclasses.fields(self))

    @property
    def batch_shape(self):
        shapes = self.param_shapes
        if not shapes:
            return ()
        full = jnp.broadcast_shapes(*shapes)
        if self.event_ndim == 0:
            return full
        return full[: len(full) - self.event_ndim]

    @property
    def event_shape(self):
        if self.event_ndim == 0:
            return ()
        full = jnp.broadcast_shapes(*self.param_shapes)
        return full[len(full) - self.event_ndim:]

    # ---- interface ----------------------------------------------------
    def log_prob(self, x) -> jax.Array:
        raise NotImplementedError

    def sample(self, key, shape=()) -> jax.Array:
        raise NotImplementedError

    def bijector(self) -> bij.Bijector:
        return bij.Identity()

    def in_support(self, x) -> jax.Array:
        """Boolean mask, batch-shaped (event dims reduced with AND)."""
        shape = jnp.broadcast_shapes(jnp.shape(x), self.batch_shape + self.event_shape)
        if self.event_ndim:
            shape = shape[: len(shape) - self.event_ndim]
        return jnp.ones(shape, dtype=bool)

    # total log density of a value under this (possibly batched) distribution
    def total_log_prob(self, x) -> jax.Array:
        lp = self.log_prob(x)
        ok = self.in_support(x)
        lp = jnp.where(ok, lp, -jnp.inf)
        return jnp.sum(lp)

    # ---- optional moments (used by user Gibbs blocks) ----------------
    def mean(self):
        raise NotImplementedError(f"mean not defined for {type(self).__name__}")

    def variance(self):
        raise NotImplementedError(f"variance not defined for {type(self).__name__}")


class UnivariateDistribution(Distribution):
    event_ndim = 0

    def in_support(self, x):
        return jnp.ones(jnp.broadcast_shapes(jnp.shape(x), self.batch_shape), dtype=bool)


class DiscreteUnivariateDistribution(UnivariateDistribution):
    is_discrete = True

    def bijector(self):
        return bij.Discrete()

    def support_bounds(self):
        """(lo, hi) integer bounds of the support, for DGS enumeration
        (reference: src/samplers/dgs.jl:109-126).  ``hi`` may be an array."""
        raise NotImplementedError


def _bc(*arrays):
    """Broadcast scalar-ish params to a common shape as float arrays."""
    arrays = tuple(jnp.asarray(a) for a in arrays)
    dtype = jnp.result_type(*(a.dtype for a in arrays), jnp.float32)
    shape = jnp.broadcast_shapes(*(a.shape for a in arrays))
    return tuple(jnp.broadcast_to(a.astype(dtype), shape) for a in arrays)
