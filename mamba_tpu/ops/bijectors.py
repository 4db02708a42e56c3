"""Support bijectors: unconstrained <-> constrained transforms with log-Jacobians.

TPU-native replacement for the reference's link/invlink/logpdf(transform=true)
table (reference: src/distributions/transformdistribution.jl:6-93 and
src/distributions/pdmatdistribution.jl:27-63).  Each bijector is a small
pytree; ``forward`` maps unconstrained -> constrained (reference ``invlink``),
``inverse`` maps back (reference ``link``), and ``forward_log_det`` is the
log |d forward / du| that gets *added* to the constrained log-density so that
samplers run on an unconstrained Euclidean space.

All maps are elementwise-vectorized and built from VPU-friendly primitives
(softplus/sigmoid/exp/cumsum) so XLA fuses them into the surrounding
log-density computation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import nn

from ..utils.pytree import register_dataclass_pytree


def _bijector(static: tuple[str, ...] = ()):
    def deco(cls):
        cls = dataclasses.dataclass(frozen=True)(cls)
        return register_dataclass_pytree(cls, static_fields=static)
    return deco


class Bijector:
    """unconstrained u -> constrained x.  Subclasses define forward/inverse/
    forward_log_det and (for shape-changing maps) unconstrained_shape."""

    def unconstrained_shape(self, event_shape: tuple[int, ...]) -> tuple[int, ...]:
        return event_shape

    def forward_log_det(self, u):
        raise NotImplementedError

    # summed log-det over an event of given ndim (0 for scalar/elementwise)
    def event_log_det(self, u, event_ndim: int):
        ld = self.forward_log_det(u)
        if event_ndim == 0:
            return ld
        return jnp.sum(ld, axis=tuple(range(-event_ndim, 0)))


@_bijector()
class Identity(Bijector):
    def forward(self, u):
        return u

    def inverse(self, x):
        return x

    def forward_log_det(self, u):
        return jnp.zeros_like(u)


@_bijector()
class Exp(Bijector):
    """u -> exp(u); positive support (reference PositiveDistribution log link,
    transformdistribution.jl:66-78)."""

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def forward_log_det(self, u):
        return u


@_bijector()
class LowerBounded(Bijector):
    """u -> lo + exp(u)."""
    lo: jax.Array

    def forward(self, u):
        return self.lo + jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x - self.lo)

    def forward_log_det(self, u):
        return jnp.broadcast_to(u, jnp.broadcast_shapes(jnp.shape(u), jnp.shape(self.lo)))


@_bijector()
class UpperBounded(Bijector):
    """u -> hi - exp(u)."""
    hi: jax.Array

    def forward(self, u):
        return self.hi - jnp.exp(u)

    def inverse(self, x):
        return jnp.log(self.hi - x)

    def forward_log_det(self, u):
        return jnp.broadcast_to(u, jnp.broadcast_shapes(jnp.shape(u), jnp.shape(self.hi)))


@_bijector()
class Sigmoid(Bijector):
    """u -> lo + (hi-lo) * sigmoid(u); bounded support (reference logit link,
    transformdistribution.jl:14-27 & UnitDistribution 83-93)."""
    lo: jax.Array
    hi: jax.Array

    def forward(self, u):
        return self.lo + (self.hi - self.lo) * nn.sigmoid(u)

    def inverse(self, x):
        p = (x - self.lo) / (self.hi - self.lo)
        return jnp.log(p) - jnp.log1p(-p)

    def forward_log_det(self, u):
        # log((hi-lo) * sigmoid(u) * (1-sigmoid(u)))
        ld = jnp.log(self.hi - self.lo) - nn.softplus(u) - nn.softplus(-u)
        return jnp.broadcast_to(ld, jnp.broadcast_shapes(jnp.shape(u), jnp.shape(self.lo), jnp.shape(self.hi)))


@_bijector()
class StickBreaking(Bijector):
    """R^{d-1} -> interior of the (d-1)-simplex (length-d probability vector).

    Stan-style stick-breaking with centering offsets so u=0 maps to the
    uniform simplex point.  Replaces the reference's SliceSimplex-only
    handling of simplex nodes with a generic unconstrained parameterization.
    """

    def unconstrained_shape(self, event_shape):
        return event_shape[:-1] + (event_shape[-1] - 1,)

    def forward(self, u):
        d = u.shape[-1] + 1
        offsets = jnp.log(jnp.arange(d - 1, 0, -1, dtype=u.dtype))
        z = nn.sigmoid(u - offsets)
        zpad = jnp.concatenate([z, jnp.ones_like(z[..., :1])], axis=-1)
        rem = jnp.cumprod(1.0 - z, axis=-1)
        rem = jnp.concatenate([jnp.ones_like(z[..., :1]), rem], axis=-1)
        return rem * zpad

    def inverse(self, x):
        d = x.shape[-1]
        offsets = jnp.log(jnp.arange(d - 1, 0, -1, dtype=x.dtype))
        csum = jnp.cumsum(x[..., :-1], axis=-1)
        rem = 1.0 - jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
        z = x[..., :-1] / rem
        return jnp.log(z) - jnp.log1p(-z) + offsets

    def event_log_det(self, u, event_ndim: int):
        d = u.shape[-1] + 1
        offsets = jnp.log(jnp.arange(d - 1, 0, -1, dtype=u.dtype))
        v = u - offsets
        z = nn.sigmoid(v)
        rem = jnp.cumprod(1.0 - z, axis=-1)
        rem = jnp.concatenate([jnp.ones_like(z[..., :1]), rem[..., :-1]], axis=-1)
        ld = -nn.softplus(v) - nn.softplus(-v) + jnp.log(rem)
        ld = jnp.sum(ld, axis=-1)
        if event_ndim > 1:
            ld = jnp.sum(ld, axis=tuple(range(-(event_ndim - 1), 0)))
        return ld

    def forward_log_det(self, u):
        raise NotImplementedError("use event_log_det")


def _tril_indices(d):
    return jnp.tril_indices(d)


@_bijector(static=("dim",))
class CholeskyPD(Bijector):
    """R^{d(d+1)/2} -> symmetric positive-definite d x d matrix.

    x = L L^T with L lower-triangular, diag(L) = exp(u_diag).  Replaces the
    reference's upper-triangle packing + Cholesky log-diag link for
    Wishart/InverseWishart nodes (pdmatdistribution.jl:5-63) with the standard
    unconstrained Cholesky parameterization.
    """
    dim: int

    def unconstrained_shape(self, event_shape):
        d = self.dim
        return event_shape[:-2] + (d * (d + 1) // 2,)

    def _to_L(self, u):
        d = self.dim
        rows, cols = jnp.tril_indices(d)
        L = jnp.zeros(u.shape[:-1] + (d, d), u.dtype).at[..., rows, cols].set(u)
        di = jnp.arange(d)
        return L.at[..., di, di].set(jnp.exp(L[..., di, di]))

    def forward(self, u):
        L = self._to_L(u)
        return L @ jnp.swapaxes(L, -1, -2)

    def inverse(self, x):
        L = jnp.linalg.cholesky(x)
        d = self.dim
        logdiag = jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))
        L = L.at[..., jnp.arange(d), jnp.arange(d)].set(logdiag)
        rows, cols = jnp.tril_indices(d)
        return L[..., rows, cols]

    def event_log_det(self, u, event_ndim: int):
        # |d(LL^T)/du| = 2^d * prod_i L_ii^(d-i+2)  (i 1-based) times
        # d(diag)/du_diag = L_ii  -> standard result:
        # log det J = d*log2 + sum_i (d - i + 2) * u_diag_i   with L_ii=exp(u_i)
        d = self.dim
        diag_pos = jnp.cumsum(jnp.arange(d) + 1) - 1  # positions of diag in tril packing
        udiag = u[..., diag_pos]
        i = jnp.arange(1, d + 1, dtype=u.dtype)
        ld = d * jnp.log(jnp.asarray(2.0, u.dtype)) + jnp.sum((d - i + 2.0) * udiag, axis=-1)
        if event_ndim > 2:
            ld = jnp.sum(ld, axis=tuple(range(-(event_ndim - 2), 0)))
        return ld

    def forward_log_det(self, u):
        raise NotImplementedError("use event_log_det")


@_bijector()
class Discrete(Bijector):
    """Marker bijector for discrete-support nodes: identity map, zero
    Jacobian, flags the site as non-differentiable (excluded from
    gradient-based blocks)."""

    def forward(self, u):
        return u

    def inverse(self, x):
        return x

    def forward_log_det(self, u):
        return jnp.zeros_like(u)
