"""Von Mises-Fisher directional distribution (reference import list,
src/Mamba.jl:31-33).

Needs log I_v(kappa) for arbitrary real order v = p/2 - 1; supplied here by
``log_bessel_i``: an ascending power series for small argument switched (via
``jnp.where``, branch-free) to the large-argument asymptotic expansion.
Sampling is Wood's (1994) rejection for the cosine component run as a
fixed-round batched loop, composed with a uniform tangent direction and a
Householder rotation onto the mean direction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy import special as sps

from .base import distribution
from .multivariate import _MvBase

__all__ = ["VonMisesFisher", "log_bessel_i"]

_SERIES_K = 48


def log_bessel_i(v, z):
    """log I_v(z) for v >= 0, z > 0 (elementwise, static shapes).

    Small z: logsumexp of the ascending series
        I_v(z) = sum_k (z/2)^(v+2k) / (k! Gamma(v+k+1)).
    Large z (> 30 + v^2/4): asymptotic
        I_v(z) ~ e^z / sqrt(2 pi z) * (1 - mu1/(8z) + ...),  mu = 4 v^2.
    """
    dt = jnp.result_type(v, z, jnp.float32)
    v = jnp.asarray(v, dt)
    z = jnp.asarray(z, dt)
    v, z = jnp.broadcast_arrays(v, z)

    # ---- series branch (safe z capped to keep terms finite) ----
    zs = jnp.minimum(z, 60.0 + 0.5 * v * v)
    k = jnp.arange(_SERIES_K, dtype=dt).reshape((-1,) + (1,) * z.ndim)
    log_half_z = jnp.log(0.5 * zs)
    terms = (v + 2.0 * k) * log_half_z - sps.gammaln(k + 1.0) - sps.gammaln(v + k + 1.0)
    series = sps.logsumexp(terms, axis=0)

    # ---- asymptotic branch ----
    mu = 4.0 * v * v
    za = jnp.maximum(z, 1.0)
    corr = (1.0 - (mu - 1.0) / (8.0 * za)
            + (mu - 1.0) * (mu - 9.0) / (128.0 * za * za)
            - (mu - 1.0) * (mu - 9.0) * (mu - 25.0) / (3072.0 * za ** 3))
    asym = z - 0.5 * jnp.log(2.0 * jnp.pi * za) + jnp.log(jnp.maximum(corr, 1e-30))

    return jnp.where(z < 30.0 + 0.25 * mu, series, asym)


@distribution()
class VonMisesFisher(_MvBase):
    """vMF on the unit sphere S^(p-1): density C_p(kappa) exp(kappa mu.x)
    with C_p(kappa) = kappa^(p/2-1) / ((2 pi)^(p/2) I_(p/2-1)(kappa)).
    ``mu`` must be unit-norm."""
    mu: jax.Array
    kappa: jax.Array = 1.0

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.mu)[:-1], jnp.shape(self.kappa))

    @property
    def event_shape(self):
        return jnp.shape(self.mu)[-1:]

    def _log_norm(self):
        p = jnp.shape(self.mu)[-1]
        kappa = jnp.asarray(self.kappa, jnp.result_type(self.kappa, jnp.float32))
        v = 0.5 * p - 1.0
        return (v * jnp.log(jnp.maximum(kappa, 1e-30))
                - 0.5 * p * jnp.log(2.0 * jnp.pi)
                - log_bessel_i(v, jnp.maximum(kappa, 1e-30)))

    def log_prob(self, x):
        mu = jnp.asarray(self.mu)
        kappa = jnp.asarray(self.kappa)
        return kappa * jnp.sum(mu * x, axis=-1) + self._log_norm()

    def in_support(self, x):
        r2 = jnp.sum(jnp.asarray(x) ** 2, axis=-1)
        return jnp.abs(r2 - 1.0) < 1e-3

    def sample(self, key, shape=()):
        mu = jnp.asarray(self.mu, jnp.result_type(self.mu, jnp.float32))
        p = mu.shape[-1]
        kappa = jnp.broadcast_to(
            jnp.asarray(self.kappa, mu.dtype), self.batch_shape)
        out_batch = shape + self.batch_shape
        kappa = jnp.broadcast_to(kappa, out_batch)

        # Wood (1994): rejection for w = cos(angle to mu)
        d = p - 1.0
        b = d / (2.0 * kappa + jnp.sqrt(4.0 * kappa * kappa + d * d))
        x0 = (1.0 - b) / (1.0 + b)
        c = kappa * x0 + d * jnp.log(1.0 - x0 * x0)

        def round_fn(carry, k):
            w, accepted = carry
            k1, k2 = random.split(k)
            zb = random.beta(k1, 0.5 * d, 0.5 * d, out_batch)
            u = random.uniform(k2, out_batch, minval=1e-7)
            wc = (1.0 - (1.0 + b) * zb) / (1.0 - (1.0 - b) * zb)
            ok = kappa * wc + d * jnp.log(jnp.maximum(1.0 - x0 * wc, 1e-30)) - c >= jnp.log(u)
            w = jnp.where(accepted, w, jnp.where(ok, wc, w))
            return (w, accepted | ok), None

        key, kw, kv = random.split(key, 3)
        (w, _), _ = jax.lax.scan(
            round_fn, (jnp.full(out_batch, 1.0 - 1e-6), jnp.zeros(out_batch, bool)),
            random.split(kw, 64))

        # uniform direction in the tangent (p-1)-subspace of e1
        v = random.normal(kv, out_batch + (p - 1,))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        z = jnp.concatenate([w[..., None],
                             jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))[..., None] * v],
                            axis=-1)

        # Householder: reflect e1 onto mu
        e1 = jnp.zeros((p,)).at[0].set(1.0)
        u_h = e1 - mu
        u_norm = jnp.linalg.norm(u_h, axis=-1, keepdims=True)
        u_h = jnp.where(u_norm > 1e-7, u_h / jnp.maximum(u_norm, 1e-30),
                        jnp.zeros_like(u_h))
        return z - 2.0 * jnp.sum(z * u_h, axis=-1, keepdims=True) * u_h

    def mean(self):
        # mean *direction* scaled by A_p(kappa) = I_{p/2}/I_{p/2-1}
        p = jnp.shape(self.mu)[-1]
        kappa = jnp.maximum(
            jnp.asarray(self.kappa, jnp.result_type(self.kappa, jnp.float32)), 1e-30)
        a = jnp.exp(log_bessel_i(0.5 * p, kappa) - log_bessel_i(0.5 * p - 1.0, kappa))
        return jnp.asarray(self.mu) * a[..., None]
