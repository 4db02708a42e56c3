"""Heterogeneous per-element distribution vectors.

TPU-native counterpart of the reference's mixed ``Array{Univariate
Distribution}`` nodes — one node whose elements follow *different* families
(e.g. the magnesium example's six prior sensitivities, doc/examples/
magnesium.jl:74-84; dispatch machinery in distributionstruct.jl:22-79).

``Mixed(d1, d2, ...)`` behaves as a vector-variate distribution of length
n: log_prob/sample/in_support evaluate each element under its own family
(unrolled at trace time — the families are static), and the support
bijector is the blockwise stack of the element bijectors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...utils.pytree import register_dataclass_pytree
from .. import bijectors as bij
from .base import Distribution


@dataclasses.dataclass(frozen=True)
class Blockwise(bij.Bijector):
    """Elementwise-stacked scalar bijectors for a length-n vector."""
    parts: tuple

    def forward(self, u):
        return jnp.stack([b.forward(u[..., i])
                          for i, b in enumerate(self.parts)], axis=-1)

    def inverse(self, x):
        return jnp.stack([b.inverse(x[..., i])
                          for i, b in enumerate(self.parts)], axis=-1)

    def forward_log_det(self, u):
        return jnp.stack([b.forward_log_det(u[..., i])
                          for i, b in enumerate(self.parts)], axis=-1)


register_dataclass_pytree(Blockwise)


@dataclasses.dataclass(frozen=True)
class Mixed(Distribution):
    parts: tuple

    def __init__(self, *dists):
        if len(dists) == 1 and isinstance(dists[0], (tuple, list)):
            dists = tuple(dists[0])
        for d in dists:
            if getattr(d, "event_ndim", 0) != 0:
                raise ValueError("Mixed elements must be univariate")
        object.__setattr__(self, "parts", tuple(dists))

    event_ndim = 1

    @property
    def batch_shape(self):
        return ()

    @property
    def event_shape(self):
        return (len(self.parts),)

    def log_prob(self, x):
        return sum(d.log_prob(x[..., i]) for i, d in enumerate(self.parts))

    def in_support(self, x):
        ok = self.parts[0].in_support(x[..., 0])
        for i, d in enumerate(self.parts[1:], start=1):
            ok = ok & d.in_support(x[..., i])
        return ok

    def sample(self, key, shape=()):
        keys = jax.random.split(key, len(self.parts))
        cols = [d.sample(k, shape) for k, d in zip(keys, self.parts)]
        return jnp.stack([jnp.broadcast_to(c, shape) for c in cols], axis=-1)

    def bijector(self):
        return Blockwise(tuple(d.bijector() for d in self.parts))


# custom pytree registration: the variadic __init__ takes the parts
# positionally
jax.tree_util.register_pytree_node(
    Mixed,
    lambda d: ((d.parts,), None),
    lambda aux, children: Mixed(*children[0]))
