"""Remaining continuous univariate kernels from the reference's import list.

The reference re-exports every Distributions.jl univariate usable in node
declarations (src/Mamba.jl:12-37): beyond the common families in
``univariate.py`` that list includes Arcsine, BetaPrime, the kernel-density
families (Biweight, Cosine, Epanechnikov, Triweight), Chi, Erlang, FDist,
Frechet, InverseGaussian, the Kolmogorov-Smirnov laws, Levy, the noncentral
family, NormalCanon, Rayleigh, the triangular laws and VonMises.  This module
supplies them as pure-JAX batched kernels following the same protocol.

Noncentral log-densities are evaluated as Poisson mixtures with a fixed-width
``logsumexp`` series (static shapes for XLA; accurate for noncentrality
``lambda`` up to ~2 * _SERIES_TERMS).  Kolmogorov-law tails use the classical
Jacobi theta series.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy import special as sps

from .. import bijectors as bij
from .base import Distribution, UnivariateDistribution, distribution, _bc
from .univariate import Gamma, _HALF_LOG_2PI

__all__ = [
    "Arcsine", "BetaPrime", "Biweight", "Chi", "Cosine", "Epanechnikov",
    "Erlang", "FDist", "Frechet", "InverseGaussian", "Kolmogorov", "KSDist",
    "KSOneSided", "Levy", "NoncentralBeta", "NoncentralChisq", "NoncentralF",
    "NoncentralT", "NormalCanon", "Rayleigh", "SymTriangularDist",
    "TriangularDist", "Triweight", "VonMises",
]

_SERIES_TERMS = 64  # Poisson-mixture truncation for noncentral families


def _poisson_mixture_logpdf(log_weight_j, log_pdf_j):
    """logsumexp_j [ log Pois(j; lam/2) + log pdf_j(x) ] over a static range."""
    j = jnp.arange(_SERIES_TERMS, dtype=jnp.float32)
    terms = log_weight_j(j) + log_pdf_j(j)
    return sps.logsumexp(terms, axis=0)


def _pois_logpmf(j, lam):
    return sps.xlogy(j, lam) - lam - sps.gammaln(j + 1.0)


@distribution()
class Arcsine(UnivariateDistribution):
    """Arcsine law on [a, b]: pdf = 1 / (pi sqrt((x-a)(b-x)))."""
    a: jax.Array = 0.0
    b: jax.Array = 1.0

    def log_prob(self, x):
        a, b = _bc(self.a, self.b)
        return -jnp.log(jnp.pi) - 0.5 * (jnp.log(x - a) + jnp.log(b - x))

    def sample(self, key, shape=()):
        a, b = _bc(self.a, self.b)
        u = random.uniform(key, shape + a.shape, a.dtype)
        s = jnp.sin(0.5 * jnp.pi * u)
        return a + (b - a) * s * s

    def in_support(self, x):
        a, b = _bc(self.a, self.b)
        return (x > a) & (x < b)

    def bijector(self):
        return bij.Sigmoid(*_bc(self.a, self.b))

    def cdf(self, x):
        a, b = _bc(self.a, self.b)
        z = jnp.clip((x - a) / (b - a), 0.0, 1.0)
        return 2.0 / jnp.pi * jnp.arcsin(jnp.sqrt(z))

    def icdf(self, q):
        a, b = _bc(self.a, self.b)
        s = jnp.sin(0.5 * jnp.pi * q)
        return a + (b - a) * s * s

    def mean(self):
        a, b = _bc(self.a, self.b)
        return 0.5 * (a + b)


@distribution()
class BetaPrime(UnivariateDistribution):
    """pdf = x^(a-1) (1+x)^-(a+b) / B(a, b), x > 0 (ratio of Gammas)."""
    alpha: jax.Array = 1.0
    beta: jax.Array = 1.0

    def log_prob(self, x):
        a, b = _bc(self.alpha, self.beta)
        return (sps.xlogy(a - 1.0, x) - (a + b) * jnp.log1p(x)
                - sps.gammaln(a) - sps.gammaln(b) + sps.gammaln(a + b))

    def sample(self, key, shape=()):
        a, b = _bc(self.alpha, self.beta)
        k1, k2 = random.split(key)
        g1 = random.gamma(k1, a, shape + a.shape, a.dtype)
        g2 = random.gamma(k2, b, shape + b.shape, b.dtype)
        return g1 / g2

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def cdf(self, x):
        a, b = _bc(self.alpha, self.beta)
        return sps.betainc(a, b, x / (1.0 + x))

    def mean(self):
        a, b = _bc(self.alpha, self.beta)
        return a / (b - 1.0)


class _KernelDistribution(UnivariateDistribution):
    """Shared scaffolding for the compact kernel-density families
    (Biweight/Cosine/Epanechnikov/Triweight): location mu, scale sigma,
    support [mu - sigma, mu + sigma].  Subclasses define the standardized
    log-kernel on z in [-1, 1] and its cdf; sampling is inverse-cdf by
    bisection (exact, branch-free, 40 iterations)."""

    def _z(self, x):
        mu, s = _bc(self.mu, self.sigma)
        return (x - mu) / s, s

    def log_prob(self, x):
        z, s = self._z(x)
        return self._log_kernel(jnp.clip(z, -1.0, 1.0)) - jnp.log(s)

    def in_support(self, x):
        mu, s = _bc(self.mu, self.sigma)
        return (x >= mu - s) & (x <= mu + s)

    def bijector(self):
        mu, s = _bc(self.mu, self.sigma)
        return bij.Sigmoid(mu - s, mu + s)

    def cdf(self, x):
        z, _ = self._z(x)
        return self._kernel_cdf(jnp.clip(z, -1.0, 1.0))

    def sample(self, key, shape=()):
        mu, s = _bc(self.mu, self.sigma)
        q = random.uniform(key, shape + mu.shape, mu.dtype)
        lo = jnp.broadcast_to(jnp.asarray(-1.0, q.dtype), q.shape)
        hi = jnp.broadcast_to(jnp.asarray(1.0, q.dtype), q.shape)

        def body(_, lh):
            l, h = lh
            m = 0.5 * (l + h)
            below = self._kernel_cdf(m) < q
            return jnp.where(below, m, l), jnp.where(below, h, m)

        l, h = jax.lax.fori_loop(0, 40, body, (lo, hi))
        return mu + s * 0.5 * (l + h)

    def mean(self):
        return _bc(self.mu, self.sigma)[0]


@distribution()
class Biweight(_KernelDistribution):
    """Quartic (biweight) kernel: pdf = (15/16)(1 - z^2)^2 / sigma."""
    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def _log_kernel(self, z):
        return jnp.log(15.0 / 16.0) + 2.0 * jnp.log1p(-z * z)

    def _kernel_cdf(self, z):
        return 0.0625 * (3.0 * z ** 5 - 10.0 * z ** 3 + 15.0 * z + 8.0)


@distribution()
class Cosine(_KernelDistribution):
    """Raised-cosine: pdf = (1 + cos(pi z)) / (2 sigma) on [mu-sigma, mu+sigma]."""
    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def _log_kernel(self, z):
        return jnp.log1p(jnp.cos(jnp.pi * z)) - jnp.log(2.0)

    def _kernel_cdf(self, z):
        return 0.5 * (1.0 + z + jnp.sin(jnp.pi * z) / jnp.pi)


@distribution()
class Epanechnikov(_KernelDistribution):
    """Parabolic kernel: pdf = (3/4)(1 - z^2) / sigma."""
    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def _log_kernel(self, z):
        return jnp.log(0.75) + jnp.log1p(-z * z)

    def _kernel_cdf(self, z):
        return 0.25 * (2.0 + 3.0 * z - z ** 3)


@distribution()
class Triweight(_KernelDistribution):
    """pdf = (35/32)(1 - z^2)^3 / sigma."""
    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def _log_kernel(self, z):
        return jnp.log(35.0 / 32.0) + 3.0 * jnp.log1p(-z * z)

    def _kernel_cdf(self, z):
        return (-5.0 * z ** 7 + 21.0 * z ** 5 - 35.0 * z ** 3 + 35.0 * z + 16.0) / 32.0


@distribution()
class Chi(UnivariateDistribution):
    """Chi law with nu dof: X = sqrt(Chisq(nu))."""
    nu: jax.Array = 1.0

    def log_prob(self, x):
        (nu,) = _bc(self.nu)
        h = 0.5 * nu
        return (sps.xlogy(nu - 1.0, x) - 0.5 * x * x
                - (h - 1.0) * jnp.log(2.0) - sps.gammaln(h))

    def sample(self, key, shape=()):
        (nu,) = _bc(self.nu)
        return jnp.sqrt(2.0 * random.gamma(key, 0.5 * nu, shape + nu.shape, nu.dtype))

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def cdf(self, x):
        (nu,) = _bc(self.nu)
        return sps.gammainc(0.5 * nu, 0.5 * x * x)

    def mean(self):
        (nu,) = _bc(self.nu)
        return jnp.sqrt(2.0) * jnp.exp(sps.gammaln(0.5 * (nu + 1.0)) - sps.gammaln(0.5 * nu))


def Erlang(alpha=1, theta=1.0):
    """Erlang(k, theta) = Gamma with integer shape (Distributions.jl alias)."""
    return Gamma(alpha=alpha, theta=theta)


@distribution()
class FDist(UnivariateDistribution):
    """Fisher-Snedecor F(nu1, nu2)."""
    nu1: jax.Array = 1.0
    nu2: jax.Array = 1.0

    def log_prob(self, x):
        n1, n2 = _bc(self.nu1, self.nu2)
        h1, h2 = 0.5 * n1, 0.5 * n2
        return (h1 * jnp.log(n1 / n2) + sps.xlogy(h1 - 1.0, x)
                - (h1 + h2) * jnp.log1p(n1 * x / n2)
                - sps.gammaln(h1) - sps.gammaln(h2) + sps.gammaln(h1 + h2))

    def sample(self, key, shape=()):
        n1, n2 = _bc(self.nu1, self.nu2)
        k1, k2 = random.split(key)
        g1 = random.gamma(k1, 0.5 * n1, shape + n1.shape, n1.dtype)
        g2 = random.gamma(k2, 0.5 * n2, shape + n2.shape, n2.dtype)
        return (g1 / n1) / (g2 / n2)

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def cdf(self, x):
        n1, n2 = _bc(self.nu1, self.nu2)
        return sps.betainc(0.5 * n1, 0.5 * n2, n1 * x / (n1 * x + n2))

    def mean(self):
        n1, n2 = _bc(self.nu1, self.nu2)
        return n2 / (n2 - 2.0)


@distribution()
class Frechet(UnivariateDistribution):
    """Inverse Weibull: shape alpha, scale theta."""
    alpha: jax.Array = 1.0
    theta: jax.Array = 1.0

    def log_prob(self, x):
        a, t = _bc(self.alpha, self.theta)
        z = x / t
        return jnp.log(a / t) - (1.0 + a) * jnp.log(z) - z ** (-a)

    def sample(self, key, shape=()):
        a, t = _bc(self.alpha, self.theta)
        u = random.uniform(key, shape + a.shape, a.dtype)
        return t * (-jnp.log(u)) ** (-1.0 / a)

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def cdf(self, x):
        a, t = _bc(self.alpha, self.theta)
        return jnp.exp(-((x / t) ** (-a)))

    def icdf(self, q):
        a, t = _bc(self.alpha, self.theta)
        return t * (-jnp.log(q)) ** (-1.0 / a)


@distribution()
class InverseGaussian(UnivariateDistribution):
    """Wald law: mean mu, shape lam."""
    mu: jax.Array = 1.0
    lam: jax.Array = 1.0

    def log_prob(self, x):
        mu, lam = _bc(self.mu, self.lam)
        d = x - mu
        return (0.5 * jnp.log(lam) - _HALF_LOG_2PI - 1.5 * jnp.log(x)
                - lam * d * d / (2.0 * mu * mu * x))

    def sample(self, key, shape=()):
        # Michael-Schucany-Haas (1976) transform-with-rejection-free mixture
        mu, lam = _bc(self.mu, self.lam)
        k1, k2 = random.split(key)
        z = random.normal(k1, shape + mu.shape, mu.dtype)
        y = z * z
        x = (mu + mu * mu * y / (2.0 * lam)
             - mu / (2.0 * lam) * jnp.sqrt(4.0 * mu * lam * y + mu * mu * y * y))
        u = random.uniform(k2, x.shape, mu.dtype)
        return jnp.where(u <= mu / (mu + x), x, mu * mu / x)

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def cdf(self, x):
        mu, lam = _bc(self.mu, self.lam)
        rt = jnp.sqrt(lam / x)
        return (sps.ndtr(rt * (x / mu - 1.0))
                + jnp.exp(2.0 * lam / mu) * sps.ndtr(-rt * (x / mu + 1.0)))

    def mean(self):
        return _bc(self.mu, self.lam)[0]

    def variance(self):
        mu, lam = _bc(self.mu, self.lam)
        return mu ** 3 / lam


def _kolmogorov_cdf(x, terms=12):
    """P(K <= x) = 1 - 2 sum_{k>=1} (-1)^(k-1) exp(-2 k^2 x^2)."""
    k = jnp.arange(1, terms + 1, dtype=jnp.float32)
    x = jnp.asarray(x)[..., None]
    signs = jnp.where(k % 2 == 1, 1.0, -1.0)
    s = jnp.sum(signs * jnp.exp(-2.0 * k * k * x * x), axis=-1)
    return jnp.clip(1.0 - 2.0 * s, 0.0, 1.0)


def _kolmogorov_logpdf(x, terms=12):
    """d/dx of the theta series: pdf = 8 x sum (-1)^(k-1) k^2 exp(-2 k^2 x^2)."""
    k = jnp.arange(1, terms + 1, dtype=jnp.float32)
    xx = jnp.asarray(x)[..., None]
    signs = jnp.where(k % 2 == 1, 1.0, -1.0)
    s = jnp.sum(signs * k * k * jnp.exp(-2.0 * k * k * xx * xx), axis=-1)
    return jnp.log(8.0) + jnp.log(x) + jnp.log(jnp.maximum(s, 1e-37))


@distribution()
class Kolmogorov(UnivariateDistribution):
    """Asymptotic Kolmogorov sup-distance law (Jacobi theta series)."""

    def log_prob(self, x):
        return _kolmogorov_logpdf(x)

    def cdf(self, x):
        return _kolmogorov_cdf(x)

    def sample(self, key, shape=()):
        q = random.uniform(key, shape, minval=1e-6, maxval=1.0 - 1e-7)
        lo = jnp.full(shape, 0.01)
        hi = jnp.full(shape, 4.0)

        def body(_, lh):
            l, h = lh
            m = 0.5 * (l + h)
            below = _kolmogorov_cdf(m) < q
            return jnp.where(below, m, l), jnp.where(below, h, m)

        l, h = jax.lax.fori_loop(0, 50, body, (lo, hi))
        return 0.5 * (l + h)

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.shape(x))

    def bijector(self):
        return bij.Exp()

    def mean(self):
        return jnp.asarray(jnp.sqrt(jnp.pi / 2.0) * jnp.log(2.0))


@distribution(static=("n",))
class KSDist(UnivariateDistribution):
    """Finite-sample two-sided KS statistic law for sample size n,
    via the asymptotic theta series with the Stephens (1970) finite-n
    correction sqrt(n) x -> x(sqrt(n) + 0.12 + 0.11/sqrt(n))."""
    n: int = 1

    def _t(self, x):
        rn = jnp.sqrt(jnp.asarray(float(self.n)))
        return x * (rn + 0.12 + 0.11 / rn), rn

    def log_prob(self, x):
        t, rn = self._t(x)
        return _kolmogorov_logpdf(t) + jnp.log(rn + 0.12 + 0.11 / rn)

    def cdf(self, x):
        t, _ = self._t(x)
        return _kolmogorov_cdf(t)

    def sample(self, key, shape=()):
        rn = jnp.sqrt(jnp.asarray(float(self.n)))
        return Kolmogorov().sample(key, shape) / (rn + 0.12 + 0.11 / rn)

    def in_support(self, x):
        return jnp.broadcast_to((x > 0) & (x <= 1), jnp.shape(x))

    def bijector(self):
        return bij.Sigmoid(jnp.asarray(0.0), jnp.asarray(1.0))


@distribution(static=("n",))
class KSOneSided(UnivariateDistribution):
    """One-sided KS law for sample size n: **exact** Birnbaum-Tingey (1951)
    survival function
        P(D+ >= x) = (1-x)^n
                   + x sum_{j=1..n} C(n,j) (x + j/n)^(j-1) (1 - x - j/n)^(n-j)
    (terms with 1 - x - j/n <= 0 vanish); the whole sum is one static-shape
    masked reduction, and the density is its autodiff derivative."""
    n: int = 1

    def _sf(self, x):
        n = self.n
        nf = jnp.asarray(float(n))
        x = jnp.clip(x, 1e-12, 1.0)
        j = jnp.arange(1, n + 1, dtype=x.dtype).reshape((-1,) + (1,) * jnp.ndim(x))
        r = 1.0 - x - j / nf
        logc = (sps.gammaln(nf + 1.0) - sps.gammaln(j + 1.0)
                - sps.gammaln(nf - j + 1.0))
        log_terms = (logc + sps.xlogy(j - 1.0, x + j / nf)
                     + sps.xlogy(nf - j, jnp.maximum(r, 1e-300)))
        terms = jnp.where(r > 0, jnp.exp(log_terms), 0.0)
        return jnp.clip((1.0 - x) ** n + x * jnp.sum(terms, axis=0), 0.0, 1.0)

    def cdf(self, x):
        return 1.0 - self._sf(x)

    def log_prob(self, x):
        x = jnp.asarray(x, jnp.result_type(x, jnp.float32))
        pdf = -jax.vmap(jax.grad(lambda t: self._sf(t).sum()))(x.ravel())
        return jnp.log(jnp.maximum(pdf.reshape(jnp.shape(x)), 1e-300))

    def sample(self, key, shape=()):
        q = random.uniform(key, shape, minval=1e-6, maxval=1.0 - 1e-6)
        lo, hi = jnp.zeros(shape), jnp.ones(shape)

        def body(_, lh):
            l, h = lh
            m = 0.5 * (l + h)
            below = self.cdf(m) < q
            return jnp.where(below, m, l), jnp.where(below, h, m)

        l, h = jax.lax.fori_loop(0, 50, body, (lo, hi))
        return 0.5 * (l + h)

    def in_support(self, x):
        return jnp.broadcast_to((x > 0) & (x <= 1), jnp.shape(x))

    def bijector(self):
        return bij.Sigmoid(jnp.asarray(0.0), jnp.asarray(1.0))


@distribution()
class Levy(UnivariateDistribution):
    """Levy alpha=1/2 stable: location mu, scale sigma."""
    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def log_prob(self, x):
        mu, s = _bc(self.mu, self.sigma)
        d = x - mu
        return 0.5 * jnp.log(s) - _HALF_LOG_2PI - 1.5 * jnp.log(d) - 0.5 * s / d

    def sample(self, key, shape=()):
        mu, s = _bc(self.mu, self.sigma)
        z = random.normal(key, shape + mu.shape, mu.dtype)
        return mu + s / (z * z)

    def in_support(self, x):
        mu = _bc(self.mu, self.sigma)[0]
        return x > mu

    def bijector(self):
        return bij.LowerBounded(_bc(self.mu, self.sigma)[0])

    def cdf(self, x):
        mu, s = _bc(self.mu, self.sigma)
        return 2.0 * sps.ndtr(-jnp.sqrt(s / (x - mu)))

    def icdf(self, q):
        mu, s = _bc(self.mu, self.sigma)
        z = sps.ndtri(0.5 * q)
        return mu + s / (z * z)


@distribution()
class NoncentralChisq(UnivariateDistribution):
    """Noncentral chi-square(nu, lam) as a Poisson(lam/2) mixture of
    Chisq(nu + 2j); fixed-width logsumexp series (static for XLA)."""
    nu: jax.Array = 1.0
    lam: jax.Array = 0.0

    def log_prob(self, x):
        nu, lam = _bc(self.nu, self.lam)
        x = jnp.asarray(x)

        def chisq_lp(j):
            h = 0.5 * nu + j.reshape((-1,) + (1,) * x.ndim)
            return sps.xlogy(h - 1.0, x) - 0.5 * x - sps.gammaln(h) - h * jnp.log(2.0)

        return _poisson_mixture_logpdf(
            lambda j: _pois_logpmf(j.reshape((-1,) + (1,) * x.ndim), 0.5 * lam),
            chisq_lp)

    def sample(self, key, shape=()):
        nu, lam = _bc(self.nu, self.lam)
        k1, k2 = random.split(key)
        j = random.poisson(k1, 0.5 * lam, shape + lam.shape).astype(nu.dtype)
        return 2.0 * random.gamma(k2, 0.5 * nu + j, shape + nu.shape, nu.dtype)

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def mean(self):
        nu, lam = _bc(self.nu, self.lam)
        return nu + lam


@distribution()
class NoncentralBeta(UnivariateDistribution):
    """Type-I noncentral Beta(a, b, lam): Poisson(lam/2) mixture of
    Beta(a + j, b)."""
    alpha: jax.Array = 1.0
    beta: jax.Array = 1.0
    lam: jax.Array = 0.0

    def log_prob(self, x):
        a, b, lam = _bc(self.alpha, self.beta, self.lam)
        x = jnp.asarray(x)

        def beta_lp(j):
            aj = a + j.reshape((-1,) + (1,) * x.ndim)
            return (sps.xlogy(aj - 1.0, x) + sps.xlog1py(b - 1.0, -x)
                    - sps.gammaln(aj) - sps.gammaln(b) + sps.gammaln(aj + b))

        return _poisson_mixture_logpdf(
            lambda j: _pois_logpmf(j.reshape((-1,) + (1,) * x.ndim), 0.5 * lam),
            beta_lp)

    def sample(self, key, shape=()):
        a, b, lam = _bc(self.alpha, self.beta, self.lam)
        k1, k2, k3 = random.split(key, 3)
        j = random.poisson(k1, 0.5 * lam, shape + lam.shape).astype(a.dtype)
        g1 = random.gamma(k2, a + j, shape + a.shape, a.dtype)
        g2 = random.gamma(k3, b, shape + b.shape, b.dtype)
        return g1 / (g1 + g2)

    def in_support(self, x):
        return jnp.broadcast_to((x > 0) & (x < 1),
                                jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        z = jnp.zeros(self.batch_shape)
        return bij.Sigmoid(z, z + 1.0)


@distribution()
class NoncentralF(UnivariateDistribution):
    """Noncentral F(nu1, nu2, lam): Poisson mixture over the numerator."""
    nu1: jax.Array = 1.0
    nu2: jax.Array = 1.0
    lam: jax.Array = 0.0

    def log_prob(self, x):
        n1, n2, lam = _bc(self.nu1, self.nu2, self.lam)
        x = jnp.asarray(x)

        def f_lp(j):
            jj = j.reshape((-1,) + (1,) * x.ndim)
            h1, h2 = 0.5 * n1 + jj, 0.5 * n2
            r = n1 / n2  # noncentral F keeps the *central* dof scaling
            z = r * x
            return (jnp.log(r) + sps.xlogy(h1 - 1.0, z)
                    - (h1 + h2) * jnp.log1p(z)
                    - sps.gammaln(h1) - sps.gammaln(h2) + sps.gammaln(h1 + h2))

        return _poisson_mixture_logpdf(
            lambda j: _pois_logpmf(j.reshape((-1,) + (1,) * x.ndim), 0.5 * lam),
            f_lp)

    def sample(self, key, shape=()):
        n1, n2, lam = _bc(self.nu1, self.nu2, self.lam)
        k1, k2, k3 = random.split(key, 3)
        j = random.poisson(k1, 0.5 * lam, shape + lam.shape).astype(n1.dtype)
        num = 2.0 * random.gamma(k2, 0.5 * n1 + j, shape + n1.shape, n1.dtype)
        den = 2.0 * random.gamma(k3, 0.5 * n2, shape + n2.shape, n2.dtype)
        return (num / n1) / (den / n2)

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()


@distribution()
class NoncentralT(UnivariateDistribution):
    """Noncentral t(nu, lam) = (Z + lam)/sqrt(Chisq(nu)/nu).  Log-density by
    the signed series f(x) = c(x) sum_j Gamma((nu+j+1)/2)/j! (x lam sqrt2 /
    sqrt(nu+x^2))^j — terms alternate in sign for x*lam < 0, so the sum is
    accumulated with sign-tracked logsumexp."""
    nu: jax.Array = 1.0
    lam: jax.Array = 0.0

    def log_prob(self, x):
        nu, lam = _bc(self.nu, self.lam)
        x = jnp.asarray(x)
        j = jnp.arange(_SERIES_TERMS, dtype=jnp.float32).reshape(
            (-1,) + (1,) * max(x.ndim, nu.ndim))
        q = x * lam * jnp.sqrt(2.0 / (nu + x * x))
        log_abs_q = jnp.log(jnp.maximum(jnp.abs(q), 1e-37))
        log_terms = (sps.gammaln(0.5 * (nu + j + 1.0)) - sps.gammaln(j + 1.0)
                     + j * log_abs_q)
        signs = jnp.where((q < 0) & (j % 2 == 1), -1.0, 1.0)
        m = jnp.max(log_terms, axis=0, keepdims=True)
        s = jnp.sum(signs * jnp.exp(log_terms - m), axis=0)
        log_series = jnp.squeeze(m, 0) + jnp.log(jnp.maximum(s, 1e-37))
        log_c = (0.5 * sps.xlogy(nu, nu) - 0.5 * lam * lam
                 - 0.5 * jnp.log(jnp.pi) - sps.gammaln(0.5 * nu)
                 - 0.5 * (nu + 1.0) * jnp.log(nu + x * x))
        return log_c + log_series

    def sample(self, key, shape=()):
        nu, lam = _bc(self.nu, self.lam)
        k1, k2 = random.split(key)
        z = random.normal(k1, shape + lam.shape, lam.dtype)
        c = 2.0 * random.gamma(k2, 0.5 * nu, shape + nu.shape, nu.dtype)
        return (z + lam) / jnp.sqrt(c / nu)


def NormalCanon(eta=0.0, lam=1.0):
    """Canonical-form Normal: potential eta, precision lam
    (Distributions.jl NormalCanon) — mean eta/lam, sd 1/sqrt(lam)."""
    from .univariate import Normal
    eta, lam = _bc(eta, lam)
    return Normal(mu=eta / lam, sigma=1.0 / jnp.sqrt(lam))


@distribution()
class Rayleigh(UnivariateDistribution):
    sigma: jax.Array = 1.0

    def log_prob(self, x):
        (s,) = _bc(self.sigma)
        return jnp.log(x) - 2.0 * jnp.log(s) - 0.5 * (x / s) ** 2

    def sample(self, key, shape=()):
        (s,) = _bc(self.sigma)
        u = random.uniform(key, shape + s.shape, s.dtype)
        return s * jnp.sqrt(-2.0 * jnp.log1p(-u))

    def in_support(self, x):
        return jnp.broadcast_to(x > 0, jnp.broadcast_shapes(jnp.shape(x), self.batch_shape))

    def bijector(self):
        return bij.Exp()

    def cdf(self, x):
        (s,) = _bc(self.sigma)
        return -jnp.expm1(-0.5 * (x / s) ** 2)

    def icdf(self, q):
        (s,) = _bc(self.sigma)
        return s * jnp.sqrt(-2.0 * jnp.log1p(-q))

    def mean(self):
        (s,) = _bc(self.sigma)
        return s * jnp.sqrt(0.5 * jnp.pi)


@distribution()
class TriangularDist(UnivariateDistribution):
    """Triangular on [a, b] with mode c."""
    a: jax.Array = 0.0
    b: jax.Array = 1.0
    c: jax.Array = 0.5

    def log_prob(self, x):
        a, b, c = _bc(self.a, self.b, self.c)
        up = jnp.log(2.0) + jnp.log(x - a) - jnp.log(b - a) - jnp.log(c - a)
        down = jnp.log(2.0) + jnp.log(b - x) - jnp.log(b - a) - jnp.log(b - c)
        at_c = jnp.log(2.0) - jnp.log(b - a)
        return jnp.where(x < c, up, jnp.where(x > c, down, at_c))

    def cdf(self, x):
        a, b, c = _bc(self.a, self.b, self.c)
        x = jnp.clip(x, a, b)
        lo = (x - a) ** 2 / ((b - a) * jnp.maximum(c - a, 1e-37))
        hi = 1.0 - (b - x) ** 2 / ((b - a) * jnp.maximum(b - c, 1e-37))
        return jnp.where(x <= c, lo, hi)

    def icdf(self, q):
        a, b, c = _bc(self.a, self.b, self.c)
        fc = (c - a) / (b - a)
        lo = a + jnp.sqrt(q * (b - a) * (c - a))
        hi = b - jnp.sqrt((1.0 - q) * (b - a) * (b - c))
        return jnp.where(q < fc, lo, hi)

    def sample(self, key, shape=()):
        a, b, c = _bc(self.a, self.b, self.c)
        u = random.uniform(key, shape + a.shape, a.dtype)
        return self.icdf(u)

    def in_support(self, x):
        a, b, _ = _bc(self.a, self.b, self.c)
        return (x >= a) & (x <= b)

    def bijector(self):
        a, b, _ = _bc(self.a, self.b, self.c)
        return bij.Sigmoid(a, b)

    def mean(self):
        a, b, c = _bc(self.a, self.b, self.c)
        return (a + b + c) / 3.0


def SymTriangularDist(mu=0.0, sigma=1.0):
    """Symmetric triangular on [mu - sigma, mu + sigma] (Distributions.jl)."""
    mu, sigma = _bc(mu, sigma)
    return TriangularDist(a=mu - sigma, b=mu + sigma, c=mu)


def _log_i0(x):
    """log I0(x) for x >= 0, via the exponentially-scaled Bessel i0e."""
    return jnp.log(sps.i0e(x)) + x


@distribution()
class VonMises(UnivariateDistribution):
    """Circular von Mises(mu, kappa) on [mu - pi, mu + pi].  Sampling is the
    Best-Fisher (1979) wrapped-Cauchy rejection, run as a fixed-trial batched
    loop (static shape for XLA; 50 rounds => acceptance failure < 1e-30)."""
    mu: jax.Array = 0.0
    kappa: jax.Array = 1.0

    def log_prob(self, x):
        mu, k = _bc(self.mu, self.kappa)
        return k * jnp.cos(x - mu) - jnp.log(2.0 * jnp.pi) - _log_i0(k)

    def sample(self, key, shape=()):
        mu, kappa = _bc(self.mu, self.kappa)
        out_shape = shape + mu.shape
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
        r = (1.0 + rho * rho) / (2.0 * rho)

        def round_fn(carry, k):
            theta, accepted = carry
            k1, k2, k3 = random.split(k, 3)
            u1 = random.uniform(k1, out_shape)
            u2 = random.uniform(k2, out_shape)
            u3 = random.uniform(k3, out_shape)
            z = jnp.cos(jnp.pi * u1)
            f = (1.0 + r * z) / (r + z)
            c = kappa * (r - f)
            ok = (c * (2.0 - c) - u2 > 0) | (jnp.log(c / u2) + 1.0 - c >= 0)
            th = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            theta = jnp.where(accepted, theta, jnp.where(ok, th, theta))
            return (theta, accepted | ok), None

        keys = random.split(key, 50)
        (theta, _), _ = jax.lax.scan(round_fn, (jnp.zeros(out_shape), jnp.zeros(out_shape, bool)), keys)
        return mu + theta

    def in_support(self, x):
        mu = _bc(self.mu, self.kappa)[0]
        return (x >= mu - jnp.pi) & (x <= mu + jnp.pi)

    def bijector(self):
        mu = _bc(self.mu, self.kappa)[0]
        return bij.Sigmoid(mu - jnp.pi, mu + jnp.pi)

    def mean(self):
        return _bc(self.mu, self.kappa)[0]
