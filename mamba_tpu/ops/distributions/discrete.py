"""Discrete univariate distribution kernels.

Replaces the reference's Distributions.jl discrete imports (src/Mamba.jl) used
by the DGS/MISS samplers and the mixture/binary example models.  Each
distribution exposes ``support_bounds`` so the DGS sampler can enumerate a
*static, padded* support on-device (the reference enumerates dynamically,
src/samplers/dgs.jl:109-126 — impossible under XLA's static shapes; we pad to
the maximum support size and mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import random
from jax.scipy import special as sps

from .base import DiscreteUnivariateDistribution, distribution, _bc

__all__ = [
    "Bernoulli", "Binomial", "Poisson", "Geometric", "NegativeBinomial",
    "Categorical", "DiscreteUniform", "Hypergeometric",
]


def _is_int(x):
    return jnp.abs(x - jnp.round(x)) < 1e-8


@distribution()
class Bernoulli(DiscreteUnivariateDistribution):
    p: jax.Array = 0.5

    def log_prob(self, x):
        (p,) = _bc(self.p)
        return sps.xlogy(x, p) + sps.xlog1py(1.0 - x, -p)

    def sample(self, key, shape=()):
        (p,) = _bc(self.p)
        return random.bernoulli(key, p, shape + p.shape).astype(p.dtype)

    def in_support(self, x):
        return jnp.broadcast_to((x == 0) | (x == 1),
                                jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def support_bounds(self):
        (p,) = _bc(self.p)
        return jnp.zeros_like(p), jnp.ones_like(p)

    def mean(self):
        return _bc(self.p)[0]


@distribution()
class Binomial(DiscreteUnivariateDistribution):
    n: jax.Array = 1
    p: jax.Array = 0.5

    def log_prob(self, x):
        n, p = _bc(self.n, self.p)
        logc = sps.gammaln(n + 1.0) - sps.gammaln(x + 1.0) - sps.gammaln(n - x + 1.0)
        return logc + sps.xlogy(x, p) + sps.xlog1py(n - x, -p)

    def sample(self, key, shape=()):
        n, p = _bc(self.n, self.p)
        return random.binomial(key, n, p, shape + n.shape).astype(n.dtype)

    def in_support(self, x):
        n = _bc(self.n, self.p)[0]
        return (x >= 0) & (x <= n) & _is_int(x)

    def support_bounds(self):
        n, p = _bc(self.n, self.p)
        return jnp.zeros_like(n), n

    def mean(self):
        n, p = _bc(self.n, self.p)
        return n * p


@distribution()
class Poisson(DiscreteUnivariateDistribution):
    lam: jax.Array = 1.0

    def log_prob(self, x):
        (lam,) = _bc(self.lam)
        return sps.xlogy(x, lam) - lam - sps.gammaln(x + 1.0)

    def sample(self, key, shape=()):
        (lam,) = _bc(self.lam)
        return random.poisson(key, lam, shape + lam.shape).astype(lam.dtype)

    def in_support(self, x):
        return jnp.broadcast_to((x >= 0) & _is_int(x),
                                jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def support_bounds(self):
        # unbounded above: DGS truncates at mean + 10*sd (masked enumeration)
        (lam,) = _bc(self.lam)
        return jnp.zeros_like(lam), jnp.ceil(lam + 10.0 * jnp.sqrt(lam) + 10.0)

    def mean(self):
        return _bc(self.lam)[0]


@distribution()
class Geometric(DiscreteUnivariateDistribution):
    """Number of failures before first success; support {0, 1, ...}."""
    p: jax.Array = 0.5

    def log_prob(self, x):
        (p,) = _bc(self.p)
        return sps.xlog1py(x, -p) + jnp.log(p)

    def sample(self, key, shape=()):
        (p,) = _bc(self.p)
        u = random.uniform(key, shape + p.shape, p.dtype)
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-p))

    def in_support(self, x):
        return jnp.broadcast_to((x >= 0) & _is_int(x),
                                jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def support_bounds(self):
        (p,) = _bc(self.p)
        return jnp.zeros_like(p), jnp.ceil(20.0 / p)


@distribution()
class NegativeBinomial(DiscreteUnivariateDistribution):
    """r successes, success prob p; counts failures. Mean r(1-p)/p."""
    r: jax.Array = 1.0
    p: jax.Array = 0.5

    def log_prob(self, x):
        r, p = _bc(self.r, self.p)
        return (sps.gammaln(x + r) - sps.gammaln(r) - sps.gammaln(x + 1.0)
                + r * jnp.log(p) + sps.xlog1py(x, -p))

    def sample(self, key, shape=()):
        r, p = _bc(self.r, self.p)
        kg, kp = random.split(key)
        lam = random.gamma(kg, r, shape + r.shape, r.dtype) * (1.0 - p) / p
        return random.poisson(kp, lam).astype(r.dtype)

    def in_support(self, x):
        return jnp.broadcast_to((x >= 0) & _is_int(x),
                                jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def support_bounds(self):
        r, p = _bc(self.r, self.p)
        m = r * (1.0 - p) / p
        sd = jnp.sqrt(m / p)
        return jnp.zeros_like(r), jnp.ceil(m + 10.0 * sd + 10.0)


@distribution()
class Categorical(DiscreteUnivariateDistribution):
    """Support {1, ..., K} with probability vector ``p`` over the last axis
    (1-based to match the reference's Distributions.jl Categorical, used by
    the eyes mixture model doc/examples/eyes.jl)."""
    p: jax.Array = None

    @property
    def batch_shape(self):
        return jnp.shape(self.p)[:-1]

    def log_prob(self, x):
        p = jnp.asarray(self.p)
        logp = jnp.log(p)
        idx = jnp.clip(jnp.asarray(x).astype(jnp.int32) - 1, 0, p.shape[-1] - 1)
        return jnp.take_along_axis(
            jnp.broadcast_to(logp, jnp.shape(idx) + (p.shape[-1],)),
            idx[..., None], axis=-1)[..., 0]

    def sample(self, key, shape=()):
        p = jnp.asarray(self.p)
        return (random.categorical(key, jnp.log(p), axis=-1,
                                   shape=shape + p.shape[:-1]) + 1).astype(p.dtype)

    def in_support(self, x):
        K = jnp.shape(self.p)[-1]
        return (x >= 1) & (x <= K) & _is_int(x)

    def support_bounds(self):
        K = jnp.shape(self.p)[-1]
        shp = self.batch_shape
        return jnp.ones(shp), jnp.full(shp, float(K))

    def mean(self):
        p = jnp.asarray(self.p)
        k = jnp.arange(1, p.shape[-1] + 1, dtype=p.dtype)
        return jnp.sum(p * k, axis=-1)


@distribution()
class DiscreteUniform(DiscreteUnivariateDistribution):
    a: jax.Array = 0
    b: jax.Array = 1

    def log_prob(self, x):
        a, b = _bc(self.a, self.b)
        return jnp.broadcast_to(-jnp.log(b - a + 1.0),
                                jnp.broadcast_shapes(jnp.shape(x), a.shape))

    def sample(self, key, shape=()):
        a, b = _bc(self.a, self.b)
        u = random.uniform(key, shape + a.shape, a.dtype)
        return a + jnp.floor(u * (b - a + 1.0))

    def in_support(self, x):
        a, b = _bc(self.a, self.b)
        return (x >= a) & (x <= b) & _is_int(x)

    def support_bounds(self):
        a, b = _bc(self.a, self.b)
        return a, b

    def mean(self):
        a, b = _bc(self.a, self.b)
        return 0.5 * (a + b)


@distribution()
class Hypergeometric(DiscreteUnivariateDistribution):
    """ns successes, nf failures, n draws; X = successes drawn."""
    ns: jax.Array = 1
    nf: jax.Array = 1
    n: jax.Array = 1

    def log_prob(self, x):
        ns, nf, n = _bc(self.ns, self.nf, self.n)

        def logc(a, b):
            return sps.gammaln(a + 1.0) - sps.gammaln(b + 1.0) - sps.gammaln(a - b + 1.0)

        return logc(ns, x) + logc(nf, n - x) - logc(ns + nf, n)

    def in_support(self, x):
        ns, nf, n = _bc(self.ns, self.nf, self.n)
        lo = jnp.maximum(0.0, n - nf)
        hi = jnp.minimum(ns, n)
        return (x >= lo) & (x <= hi) & _is_int(x)

    def support_bounds(self):
        ns, nf, n = _bc(self.ns, self.nf, self.n)
        return jnp.maximum(0.0, n - nf), jnp.minimum(ns, n)

    def sample(self, key, shape=()):
        # categorical draw over the (bounded) enumerated support; batched
        # parameters enumerate a shared static support width and mask the
        # per-element tail (reference gets rand for free from
        # Distributions.jl, src/Mamba.jl:27-29)
        ns, nf, n = _bc(self.ns, self.nf, self.n)
        lo, hi = self.support_bounds()
        # support width must be static; constant parameters fold at trace
        # time, genuinely data-dependent ones cannot be enumerated
        with jax.ensure_compile_time_eval():
            try:
                width = (jnp.minimum(jnp.asarray(self.ns), jnp.asarray(self.n))
                         - jnp.maximum(0.0, jnp.asarray(self.n)
                                       - jnp.asarray(self.nf)))
                kmax = int(jnp.max(width)) + 1
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                raise NotImplementedError(
                    "Hypergeometric sampling needs concrete (non-traced) "
                    "parameters to bound the enumerated support") from None
        batch = jnp.broadcast_shapes(jnp.shape(ns), jnp.shape(nf), jnp.shape(n))
        lo = jnp.broadcast_to(lo, batch)
        hi = jnp.broadcast_to(hi, batch)
        ks = lo[..., None] + jnp.arange(kmax, dtype=ns.dtype)  # (*batch, k)
        sub = Hypergeometric(jnp.broadcast_to(ns, batch)[..., None],
                             jnp.broadcast_to(nf, batch)[..., None],
                             jnp.broadcast_to(n, batch)[..., None])
        lp = jnp.where(ks <= hi[..., None], sub.log_prob(ks), -jnp.inf)
        idx = random.categorical(key, lp, axis=-1, shape=tuple(shape) + batch)
        return jnp.broadcast_to(lo, tuple(shape) + batch) + idx
