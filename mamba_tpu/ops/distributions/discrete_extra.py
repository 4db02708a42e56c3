"""Remaining discrete univariate kernels from the reference's import list
(src/Mamba.jl:27-30): PoissonBinomial, Skellam and Fisher's noncentral
hypergeometric.

All three have finite/effectively-finite supports evaluated with static
shapes: PoissonBinomial builds its full pmf by a `lax.scan` convolution over
trials (one O(n^2) pass, fused on the VPU), Skellam sums a fixed-width
Poisson-product series with logsumexp, and NoncentralHypergeometric
normalizes over its enumerated support.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy import special as sps

from .base import DiscreteUnivariateDistribution, distribution, _bc
from .discrete import _is_int

__all__ = ["PoissonBinomial", "Skellam", "NoncentralHypergeometric"]

_SKELLAM_TERMS = 128


@distribution()
class PoissonBinomial(DiscreteUnivariateDistribution):
    """Number of successes among independent Bernoulli(p_i) trials; ``p`` is
    the success-probability vector over the last axis.  The pmf over
    {0..n} is materialized by scanning the trial axis and convolving —
    static shapes, so the whole table is one compiled kernel."""
    p: jax.Array = None

    @property
    def batch_shape(self):
        return jnp.shape(self.p)[:-1]

    def _pmf_table(self):
        p = jnp.asarray(self.p, jnp.result_type(self.p, jnp.float32))
        n = p.shape[-1]
        # pmf over counts 0..n, batched; start as delta at 0
        init = jnp.zeros(p.shape[:-1] + (n + 1,), p.dtype).at[..., 0].set(1.0)

        def step(pmf, pi):
            pi = pi[..., None]
            shifted = jnp.concatenate(
                [jnp.zeros_like(pmf[..., :1]), pmf[..., :-1]], axis=-1)
            return pmf * (1.0 - pi) + shifted * pi, None

        pmf, _ = jax.lax.scan(step, init, jnp.moveaxis(p, -1, 0))
        return pmf

    def log_prob(self, x):
        pmf = self._pmf_table()
        n = pmf.shape[-1] - 1
        idx = jnp.clip(jnp.asarray(x).astype(jnp.int32), 0, n)
        out = jnp.take_along_axis(
            jnp.broadcast_to(pmf, jnp.broadcast_shapes(jnp.shape(idx), self.batch_shape) + (n + 1,)),
            idx[..., None] if jnp.ndim(idx) else idx[None][..., None], axis=-1)[..., 0]
        return jnp.log(jnp.maximum(out, 1e-37)).reshape(jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def sample(self, key, shape=()):
        p = jnp.asarray(self.p, jnp.result_type(self.p, jnp.float32))
        u = random.uniform(key, shape + p.shape, p.dtype)
        return jnp.sum((u < p).astype(p.dtype), axis=-1)

    def in_support(self, x):
        n = jnp.shape(self.p)[-1]
        return (x >= 0) & (x <= n) & _is_int(x)

    def support_bounds(self):
        n = jnp.shape(self.p)[-1]
        shp = self.batch_shape
        return jnp.zeros(shp), jnp.full(shp, float(n))

    def mean(self):
        return jnp.sum(jnp.asarray(self.p), axis=-1)

    def variance(self):
        p = jnp.asarray(self.p)
        return jnp.sum(p * (1.0 - p), axis=-1)


@distribution()
class Skellam(DiscreteUnivariateDistribution):
    """Difference of independent Poissons: X = N1(mu1) - N2(mu2), support all
    of Z.  pmf(k) = sum_j Pois(j; mu2) Pois(j + k; mu1), accumulated with a
    fixed-width logsumexp (exact to f32 for mu up to ~_SKELLAM_TERMS/3)."""
    mu1: jax.Array = 1.0
    mu2: jax.Array = 1.0

    def log_prob(self, x):
        mu1, mu2 = _bc(self.mu1, self.mu2)
        x = jnp.asarray(x)
        nd = max(x.ndim, mu1.ndim)
        j = jnp.arange(_SKELLAM_TERMS, dtype=jnp.float32).reshape((-1,) + (1,) * nd)
        # for k >= 0: j ~ second Poisson, j+k ~ first; mirror for k < 0
        k = jnp.abs(x)
        mu_a = jnp.where(x >= 0, mu1, mu2)   # gets j + |k|
        mu_b = jnp.where(x >= 0, mu2, mu1)   # gets j

        def pois_lp(n, mu):
            return sps.xlogy(n, mu) - mu - sps.gammaln(n + 1.0)

        terms = pois_lp(j + k, mu_a) + pois_lp(j, mu_b)
        return sps.logsumexp(terms, axis=0)

    def sample(self, key, shape=()):
        mu1, mu2 = _bc(self.mu1, self.mu2)
        k1, k2 = random.split(key)
        n1 = random.poisson(k1, mu1, shape + mu1.shape)
        n2 = random.poisson(k2, mu2, shape + mu2.shape)
        return (n1 - n2).astype(mu1.dtype)

    def in_support(self, x):
        return jnp.broadcast_to(_is_int(x),
                                jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def support_bounds(self):
        # effectively-finite support for DGS enumeration: +-8 sd around the mean
        mu1, mu2 = _bc(self.mu1, self.mu2)
        m, sd = mu1 - mu2, jnp.sqrt(mu1 + mu2)
        return jnp.floor(m - 8.0 * sd), jnp.ceil(m + 8.0 * sd)

    def mean(self):
        mu1, mu2 = _bc(self.mu1, self.mu2)
        return mu1 - mu2

    def variance(self):
        mu1, mu2 = _bc(self.mu1, self.mu2)
        return mu1 + mu2


@distribution(static=("max_support",))
class NoncentralHypergeometric(DiscreteUnivariateDistribution):
    """Fisher's noncentral hypergeometric: ns successes / nf failures in the
    urn, n draws, odds ratio ``omega``.  pmf(k) proportional to
    C(ns,k) C(nf,n-k) omega^k, normalized over the enumerated support
    (static width ``max_support``; defaults to ns+n+1 bound at trace time)."""
    ns: jax.Array = 1
    nf: jax.Array = 1
    n: jax.Array = 1
    omega: jax.Array = 1.0
    max_support: int = 0

    def _logc(self, a, b):
        return sps.gammaln(a + 1.0) - sps.gammaln(b + 1.0) - sps.gammaln(a - b + 1.0)

    def _kwidth(self):
        if self.max_support:
            return self.max_support
        import numpy as np
        return int(np.max(np.minimum(np.asarray(self.ns), np.asarray(self.n)))) + 1

    def _log_weights(self):
        ns, nf, n, w = _bc(self.ns, self.nf, self.n, self.omega)
        lo = jnp.maximum(0.0, n - nf)
        hi = jnp.minimum(ns, n)
        ks = lo[..., None] + jnp.arange(self._kwidth(), dtype=ns.dtype)
        lw = (self._logc(ns[..., None], ks) + self._logc(nf[..., None], n[..., None] - ks)
              + ks * jnp.log(w[..., None]))
        lw = jnp.where(ks <= hi[..., None], lw, -jnp.inf)
        return ks, lw - sps.logsumexp(lw, axis=-1, keepdims=True)

    def log_prob(self, x):
        ks, lw = self._log_weights()
        x = jnp.asarray(x)
        lo = ks[..., 0]
        idx = jnp.clip((x - lo).astype(jnp.int32), 0, ks.shape[-1] - 1)
        full = jnp.broadcast_shapes(jnp.shape(x), self.batch_shape)
        lw = jnp.broadcast_to(lw, full + lw.shape[-1:])
        return jnp.take_along_axis(lw, jnp.broadcast_to(idx, full)[..., None], axis=-1)[..., 0]

    def sample(self, key, shape=()):
        ks, lw = self._log_weights()
        idx = random.categorical(key, lw, axis=-1, shape=shape + self.batch_shape)
        lo = jnp.broadcast_to(ks[..., 0], shape + self.batch_shape)
        return lo + idx.astype(lo.dtype)

    def in_support(self, x):
        ns, nf, n, _ = _bc(self.ns, self.nf, self.n, self.omega)
        lo = jnp.maximum(0.0, n - nf)
        hi = jnp.minimum(ns, n)
        return (x >= lo) & (x <= hi) & _is_int(x)

    def support_bounds(self):
        ns, nf, n, _ = _bc(self.ns, self.nf, self.n, self.omega)
        return jnp.maximum(0.0, n - nf), jnp.minimum(ns, n)

    def mean(self):
        ks, lw = self._log_weights()
        return jnp.sum(ks * jnp.exp(lw), axis=-1)
