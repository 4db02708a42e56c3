"""Multivariate / matrix-variate distribution kernels.

Replaces the reference's Distributions.jl multivariates + its PDMats2
block-diagonal extension (src/distributions/pdmats2.jl:16-148, extensions.jl:18-33).
Design notes:
- MvNormal comes in three parameterizations (isotropic / diagonal / full
  Cholesky) so that the common hierarchical-model cases never materialize a
  dense d x d matrix; the full case keeps a Cholesky factor so log_prob is one
  triangular solve + reduction — MXU/VPU friendly and autodiff-safe.
- BDiagNormal stores its blocks *batched* as (n, b, b): log_prob is a batched
  triangular solve, i.e. one fused kernel over all groups instead of the
  reference's per-block loop (pdmats2.jl quad-form loops).
- Wishart/InverseWishart are event_ndim=2 with Bartlett-decomposition
  sampling; their support bijector is CholeskyPD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import random
from jax.scipy import special as sps
from jax.scipy.linalg import solve_triangular

from .. import bijectors as bij
from .base import Distribution, distribution, _bc

__all__ = [
    "MvNormal", "MvNormalIso", "MvNormalDiag", "MvNormalFull", "MvNormalCanon",
    "MvTDist", "Dirichlet", "Multinomial", "BDiagNormal", "Wishart",
    "InverseWishart",
]

_LOG_2PI = 1.8378770664093453


def _tri_solve_vec(L, v, lower=True):
    """solve_triangular for a vector rhs with full batch broadcasting."""
    L = jnp.asarray(L)
    v = jnp.asarray(v)
    batch = jnp.broadcast_shapes(L.shape[:-2], v.shape[:-1])
    Lb = jnp.broadcast_to(L, batch + L.shape[-2:])
    vb = jnp.broadcast_to(v, batch + v.shape[-1:])
    return solve_triangular(Lb, vb[..., None], lower=lower)[..., 0]


class _MvBase(Distribution):
    event_ndim = 1


@distribution()
class MvNormalIso(_MvBase):
    """N(mu, sigma^2 I); ``sigma`` is a std-dev (may be batched)."""
    mu: jax.Array
    sigma: jax.Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.mu)[:-1], jnp.shape(self.sigma))

    @property
    def event_shape(self):
        return jnp.shape(self.mu)[-1:]

    def log_prob(self, x):
        mu = jnp.asarray(self.mu)
        sigma = jnp.asarray(self.sigma)
        d = mu.shape[-1]
        z = (x - mu) / sigma[..., None] if sigma.ndim else (x - mu) / sigma
        return (-0.5 * jnp.sum(z * z, -1) - d * jnp.log(sigma)
                - 0.5 * d * _LOG_2PI)

    def sample(self, key, shape=()):
        mu = jnp.asarray(self.mu)
        full = shape + self.batch_shape + self.event_shape
        sigma = jnp.asarray(self.sigma)
        s = sigma[..., None] if sigma.ndim else sigma
        return mu + s * random.normal(key, full, mu.dtype)

    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.mu), self.batch_shape + self.event_shape)

    def cov(self):
        d = self.event_shape[0]
        s = jnp.asarray(self.sigma)
        return (s ** 2)[..., None, None] * jnp.eye(d) if s.ndim else s ** 2 * jnp.eye(d)

    def invcov(self):
        d = self.event_shape[0]
        s = jnp.asarray(self.sigma)
        return jnp.eye(d) / (s ** 2)


@distribution()
class MvNormalDiag(_MvBase):
    """N(mu, diag(sigma^2)); ``sigma`` is the std-dev vector."""
    mu: jax.Array
    sigma: jax.Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.mu)[:-1], jnp.shape(self.sigma)[:-1])

    @property
    def event_shape(self):
        return jnp.shape(self.mu)[-1:]

    def log_prob(self, x):
        mu, sigma = jnp.asarray(self.mu), jnp.asarray(self.sigma)
        z = (x - mu) / sigma
        d = jnp.shape(z)[-1]
        return (-0.5 * jnp.sum(z * z, -1) - jnp.sum(jnp.log(sigma), -1)
                - 0.5 * d * _LOG_2PI)

    def sample(self, key, shape=()):
        mu = jnp.asarray(self.mu)
        full = shape + self.batch_shape + self.event_shape
        return mu + jnp.asarray(self.sigma) * random.normal(key, full, mu.dtype)

    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.mu), self.batch_shape + self.event_shape)

    def cov(self):
        s = jnp.asarray(self.sigma)
        return jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(s ** 2)

    def invcov(self):
        s = jnp.asarray(self.sigma)
        return jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(1.0 / s ** 2)


@distribution()
class MvNormalFull(_MvBase):
    """N(mu, L L^T) with lower-Cholesky ``scale_tril``."""
    mu: jax.Array
    scale_tril: jax.Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.mu)[:-1],
                                    jnp.shape(self.scale_tril)[:-2])

    @property
    def event_shape(self):
        return jnp.shape(self.scale_tril)[-1:]

    def log_prob(self, x):
        mu, L = jnp.asarray(self.mu), jnp.asarray(self.scale_tril)
        d = L.shape[-1]
        z = _tri_solve_vec(L, x - mu)
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        return -0.5 * jnp.sum(z * z, -1) - halflogdet - 0.5 * d * _LOG_2PI

    def sample(self, key, shape=()):
        mu, L = jnp.asarray(self.mu), jnp.asarray(self.scale_tril)
        full = shape + self.batch_shape + self.event_shape
        eps = random.normal(key, full, L.dtype)
        return mu + jnp.einsum("...ij,...j->...i", L, eps)

    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.mu), self.batch_shape + self.event_shape)

    def cov(self):
        L = jnp.asarray(self.scale_tril)
        return L @ jnp.swapaxes(L, -1, -2)

    def invcov(self):
        L = jnp.asarray(self.scale_tril)
        eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
        Linv = solve_triangular(L, eye, lower=True)
        return jnp.swapaxes(Linv, -1, -2) @ Linv


def MvNormal(*args, mu=None, cov=None, scale_tril=None, sigma=None):
    """Factory mirroring the reference's Distributions.jl call forms
    (src/distributions/constructors.jl:39-57):

    - ``MvNormal(mu, s)`` with scalar ``s``  -> isotropic, std ``s``
    - ``MvNormal(mu, v)`` with vector ``v``  -> diagonal, stds ``v``
    - ``MvNormal(mu, S)`` with matrix ``S``  -> full covariance ``S``
    - ``MvNormal(d::int, s)``                -> zero-mean isotropic
    - ``MvNormal(S)`` with matrix            -> zero-mean full covariance
    Keyword forms accept a precomputed ``scale_tril``.
    """
    if args:
        if len(args) == 1:
            S = jnp.asarray(args[0])
            mu = jnp.zeros(S.shape[-1], S.dtype)
            return MvNormalFull(mu, jnp.linalg.cholesky(S))
        m, s = args
        if isinstance(m, (int, np.integer)):
            m = jnp.zeros(m)
        m = jnp.asarray(m)
        s = jnp.asarray(s)
        if s.ndim == m.ndim - 1 or s.ndim == 0:
            return MvNormalIso(m, s)
        if s.shape == m.shape:
            return MvNormalDiag(m, s)
        if (s.ndim >= 2 and s.shape[-1] == s.shape[-2] == m.shape[-1]):
            # shared (or batched) covariance matrix with batched means
            return MvNormalFull(m, jnp.linalg.cholesky(s))
        if s.ndim == m.ndim:
            return MvNormalDiag(m, s)
        return MvNormalFull(m, jnp.linalg.cholesky(s))
    if scale_tril is not None:
        return MvNormalFull(jnp.asarray(mu), jnp.asarray(scale_tril))
    if cov is not None:
        c = jnp.asarray(cov)
        if mu is None:
            mu = jnp.zeros(c.shape[-1], c.dtype)
        return MvNormalFull(jnp.asarray(mu), jnp.linalg.cholesky(c))
    if sigma is not None:
        s = jnp.asarray(sigma)
        m = jnp.asarray(mu)
        return MvNormalIso(m, s) if s.ndim < m.ndim else MvNormalDiag(m, s)
    raise TypeError("MvNormal: no parameterization given")


@distribution()
class MvNormalCanon(_MvBase):
    """Canonical (natural-parameter) MvNormal: potential h, precision J
    (reference constructors.jl:47-50).  x ~ N(J^-1 h, J^-1)."""
    h: jax.Array
    J: jax.Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.h)[:-1], jnp.shape(self.J)[:-2])

    @property
    def event_shape(self):
        return jnp.shape(self.J)[-1:]

    def _chol(self):
        return jnp.linalg.cholesky(jnp.asarray(self.J))

    def log_prob(self, x):
        h, J = jnp.asarray(self.h), jnp.asarray(self.J)
        d = J.shape[-1]
        Lp = self._chol()
        mu = jnp.linalg.solve(J, h[..., None])[..., 0] if h.ndim else jnp.linalg.solve(J, h)
        diff = x - mu
        q = jnp.einsum("...i,...ij,...j->...", diff, J, diff)
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(Lp, axis1=-2, axis2=-1)), -1)
        return -0.5 * q + halflogdet - 0.5 * d * _LOG_2PI

    def sample(self, key, shape=()):
        h, J = jnp.asarray(self.h), jnp.asarray(self.J)
        Lp = self._chol()
        mu = jnp.linalg.solve(J, h)
        full = shape + self.batch_shape + self.event_shape
        eps = random.normal(key, full, J.dtype)
        # x = mu + Lp^-T eps has covariance J^-1
        z = solve_triangular(jnp.swapaxes(Lp, -1, -2), eps[..., None], lower=False)[..., 0]
        return mu + z

    def mean(self):
        return jnp.linalg.solve(jnp.asarray(self.J), jnp.asarray(self.h))

    def invcov(self):
        return jnp.asarray(self.J)


@distribution()
class MvTDist(_MvBase):
    """Multivariate Student-t with df nu, location mu, scale matrix Sigma
    (reference constructors.jl:59-66)."""
    nu: jax.Array
    mu: jax.Array
    Sigma: jax.Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.nu), jnp.shape(self.mu)[:-1],
                                    jnp.shape(self.Sigma)[:-2])

    @property
    def event_shape(self):
        return jnp.shape(self.Sigma)[-1:]

    def log_prob(self, x):
        nu = jnp.asarray(self.nu)
        mu = jnp.asarray(self.mu)
        L = jnp.linalg.cholesky(jnp.asarray(self.Sigma))
        d = L.shape[-1]
        z = _tri_solve_vec(L, x - mu)
        q = jnp.sum(z * z, -1)
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        return (sps.gammaln(0.5 * (nu + d)) - sps.gammaln(0.5 * nu)
                - 0.5 * d * jnp.log(nu * jnp.pi) - halflogdet
                - 0.5 * (nu + d) * jnp.log1p(q / nu))

    def sample(self, key, shape=()):
        nu = jnp.asarray(self.nu)
        mu = jnp.asarray(self.mu)
        L = jnp.linalg.cholesky(jnp.asarray(self.Sigma))
        kn, kg = random.split(key)
        full = shape + self.batch_shape + self.event_shape
        eps = random.normal(kn, full, L.dtype)
        g = random.gamma(kg, 0.5 * nu, shape + self.batch_shape, L.dtype)
        w = jnp.sqrt(0.5 * nu / g)
        return mu + w[..., None] * jnp.einsum("...ij,...j->...i", L, eps)

    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.mu), self.batch_shape + self.event_shape)


@distribution()
class Dirichlet(_MvBase):
    alpha: jax.Array

    def log_prob(self, x):
        a = jnp.asarray(self.alpha)
        return (jnp.sum(sps.xlogy(a - 1.0, x), -1)
                - jnp.sum(sps.gammaln(a), -1) + sps.gammaln(jnp.sum(a, -1)))

    def sample(self, key, shape=()):
        a = jnp.asarray(self.alpha)
        return random.dirichlet(key, a, shape + self.batch_shape)

    def in_support(self, x):
        return (jnp.all(x > 0, -1) & jnp.all(x < 1, -1)
                & (jnp.abs(jnp.sum(x, -1) - 1.0) < 1e-5))

    def bijector(self):
        return bij.StickBreaking()

    def mean(self):
        a = jnp.asarray(self.alpha)
        return a / jnp.sum(a, -1, keepdims=True)


@distribution()
class Multinomial(_MvBase):
    n: jax.Array
    p: jax.Array

    def log_prob(self, x):
        n = jnp.asarray(self.n, jnp.result_type(float))
        p = jnp.asarray(self.p)
        return (sps.gammaln(n + 1.0) - jnp.sum(sps.gammaln(x + 1.0), -1)
                + jnp.sum(sps.xlogy(x, p), -1))

    def sample(self, key, shape=()):
        n = jnp.asarray(self.n, jnp.result_type(float))
        p = jnp.asarray(self.p)
        return random.multinomial(key, n, p, shape=shape + self.batch_shape + p.shape[-1:])

    def in_support(self, x):
        n = jnp.asarray(self.n, jnp.result_type(float))
        return (jnp.all(x >= 0, -1) & (jnp.abs(jnp.sum(x, -1) - n) < 1e-6))

    def is_discrete_property(self):
        return True

    is_discrete = True

    def bijector(self):
        return bij.Discrete()

    def mean(self):
        n = jnp.asarray(self.n, jnp.result_type(float))
        return n[..., None] * jnp.asarray(self.p)


@distribution()
class BDiagNormal(_MvBase):
    """Block-diagonal MvNormal: mean ``mu`` (n*b,), covariance blocks
    ``blocks`` (n, b, b)  (reference extensions.jl:18-33 + pdmats2.jl).
    log_prob = batched triangular solve over the n blocks — one fused kernel
    instead of the reference's per-block Cholesky loop."""
    mu: jax.Array
    blocks: jax.Array

    @property
    def batch_shape(self):
        return ()

    @property
    def event_shape(self):
        return (jnp.shape(self.mu)[-1],)

    def _chols(self):
        return jnp.linalg.cholesky(jnp.asarray(self.blocks))

    def log_prob(self, x):
        mu = jnp.asarray(self.mu)
        Ls = self._chols()
        n, b, _ = Ls.shape
        diff = (x - mu).reshape(jnp.shape(x)[:-1] + (n, b))
        z = _tri_solve_vec(Ls, diff)
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(Ls, axis1=-2, axis2=-1)))
        return (-0.5 * jnp.sum(z * z, (-2, -1)) - halflogdet
                - 0.5 * n * b * _LOG_2PI)

    def sample(self, key, shape=()):
        mu = jnp.asarray(self.mu)
        Ls = self._chols()
        n, b, _ = Ls.shape
        eps = random.normal(key, shape + (n, b), mu.dtype)
        z = jnp.einsum("nij,...nj->...ni", Ls, eps)
        return mu + z.reshape(shape + (n * b,))

    def mean(self):
        return jnp.asarray(self.mu)


def _lmvgamma(d, a):
    """log multivariate gamma."""
    i = jnp.arange(1, d + 1, dtype=jnp.result_type(a, float))
    return (0.25 * d * (d - 1) * jnp.log(jnp.pi)
            + jnp.sum(sps.gammaln(a[..., None] + 0.5 * (1.0 - i)), -1))


class _MatrixBase(Distribution):
    event_ndim = 2


@distribution()
class Wishart(_MatrixBase):
    """Wishart(nu, S): E[X] = nu * S  (reference constructors.jl:90-97,
    pdmatdistribution.jl)."""
    nu: jax.Array
    S: jax.Array

    @property
    def batch_shape(self):
        return jnp.shape(self.S)[:-2]

    @property
    def event_shape(self):
        return jnp.shape(self.S)[-2:]

    def log_prob(self, x):
        nu = jnp.asarray(self.nu, jnp.result_type(float))
        S = jnp.asarray(self.S)
        d = S.shape[-1]
        Ls = jnp.linalg.cholesky(S)
        Lx = jnp.linalg.cholesky(x)
        logdet_x = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lx, axis1=-2, axis2=-1)), -1)
        logdet_s = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ls, axis1=-2, axis2=-1)), -1)
        # tr(S^-1 x)
        A = solve_triangular(Ls, x, lower=True)
        A = solve_triangular(Ls, jnp.swapaxes(A, -1, -2), lower=True)
        tr = jnp.trace(A, axis1=-2, axis2=-1)
        return (0.5 * (nu - d - 1.0) * logdet_x - 0.5 * tr
                - 0.5 * nu * d * jnp.log(2.0) - 0.5 * nu * logdet_s
                - _lmvgamma(d, 0.5 * nu))

    def sample(self, key, shape=()):
        nu = jnp.asarray(self.nu, jnp.result_type(float))
        S = jnp.asarray(self.S)
        d = S.shape[-1]
        Ls = jnp.linalg.cholesky(S)
        kn, kg = random.split(key)
        full = shape + self.batch_shape
        # Bartlett: A lower-tri, diag_i ~ sqrt(chi2_{nu-i+1}), offdiag ~ N(0,1)
        zn = random.normal(kn, full + (d, d), S.dtype)
        i = jnp.arange(d, dtype=S.dtype)
        chi = 2.0 * random.gamma(kg, 0.5 * (nu - i), full + (d,), S.dtype)
        A = jnp.tril(zn, -1) + jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(jnp.sqrt(chi))
        LA = jnp.einsum("...ij,...jk->...ik", Ls, A)
        return jnp.einsum("...ij,...kj->...ik", LA, LA)

    def in_support(self, x):
        eig = jnp.linalg.eigvalsh(x)
        return jnp.all(eig > 0, -1)

    def bijector(self):
        return bij.CholeskyPD(int(jnp.shape(self.S)[-1]))

    def mean(self):
        nu = jnp.asarray(self.nu, jnp.result_type(float))
        return nu[..., None, None] * jnp.asarray(self.S) if jnp.ndim(self.nu) else \
            jnp.asarray(self.nu, jnp.result_type(float)) * jnp.asarray(self.S)


@distribution()
class InverseWishart(_MatrixBase):
    """InverseWishart(nu, Psi): E[X] = Psi / (nu - d - 1)."""
    nu: jax.Array
    Psi: jax.Array

    @property
    def batch_shape(self):
        return jnp.shape(self.Psi)[:-2]

    @property
    def event_shape(self):
        return jnp.shape(self.Psi)[-2:]

    def log_prob(self, x):
        nu = jnp.asarray(self.nu, jnp.result_type(float))
        Psi = jnp.asarray(self.Psi)
        d = Psi.shape[-1]
        Lp = jnp.linalg.cholesky(Psi)
        Lx = jnp.linalg.cholesky(x)
        logdet_x = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lx, axis1=-2, axis2=-1)), -1)
        logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lp, axis1=-2, axis2=-1)), -1)
        # tr(Psi x^-1) via solves against Lx
        A = solve_triangular(Lx, Psi, lower=True)
        A = solve_triangular(Lx, jnp.swapaxes(A, -1, -2), lower=True)
        tr = jnp.trace(A, axis1=-2, axis2=-1)
        return (0.5 * nu * logdet_p - 0.5 * (nu + d + 1.0) * logdet_x - 0.5 * tr
                - 0.5 * nu * d * jnp.log(2.0) - _lmvgamma(d, 0.5 * nu))

    def sample(self, key, shape=()):
        Psi = jnp.asarray(self.Psi)
        W = Wishart(self.nu, jnp.linalg.inv(Psi))
        return jnp.linalg.inv(W.sample(key, shape))

    def in_support(self, x):
        eig = jnp.linalg.eigvalsh(x)
        return jnp.all(eig > 0, -1)

    def bijector(self):
        return bij.CholeskyPD(int(jnp.shape(self.Psi)[-1]))

    def mean(self):
        nu = jnp.asarray(self.nu, jnp.result_type(float))
        d = jnp.shape(self.Psi)[-1]
        return jnp.asarray(self.Psi) / (nu - d - 1.0)
