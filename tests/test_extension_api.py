"""User-extensibility contract tests.

Parity with the reference's extension tests (doc/mcmc/newunivardist.jl,
newmultivardist.jl; SURVEY.md §4): users define new Distribution subclasses
and fit models with them — no framework internals required.  Also covers
the PD-matrix (Wishart-node) sampling path through the CholeskyPD bijector,
which the reference exercises via pdmatdistribution.jl.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt
from mamba_tpu.ops import bijectors as bij
from mamba_tpu.ops.distributions import distribution, UnivariateDistribution, Distribution


# -- new univariate distribution (newunivardist.jl analog) -------------------

@distribution()
class NewUnivarDist(UnivariateDistribution):
    """The reference's example: f(x|mu,sigma) ~ Normal implemented by hand."""
    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def log_prob(self, x):
        z = (jnp.asarray(x) - self.mu) / self.sigma
        return -0.5 * z * z - jnp.log(self.sigma) - 0.5 * jnp.log(2 * jnp.pi)

    def sample(self, key, shape=()):
        mu = jnp.broadcast_to(jnp.asarray(self.mu, jnp.result_type(float)),
                              self.batch_shape)
        return mu + self.sigma * jax.random.normal(key, shape + mu.shape)


# -- new multivariate distribution (newmultivardist.jl analog) ---------------

@distribution()
class NewMultivarDist(Distribution):
    event_ndim = 1
    mu: jax.Array = None
    C: jax.Array = None      # covariance

    def log_prob(self, x):
        d = jnp.shape(self.mu)[-1]
        L = jnp.linalg.cholesky(self.C)
        z = jax.scipy.linalg.solve_triangular(L, x - self.mu, lower=True)
        return (-0.5 * jnp.sum(z * z, -1)
                - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
                - 0.5 * d * jnp.log(2 * jnp.pi))

    def sample(self, key, shape=()):
        L = jnp.linalg.cholesky(self.C)
        z = jax.random.normal(key, shape + jnp.shape(self.mu))
        return self.mu + z @ L.T


def test_line_with_custom_univariate():
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: NewUnivarDist(mu, jnp.sqrt(s2)),
                        monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2),
                                                jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 3.0)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1., 6.)], 1)
    inits = {"y": np.array([1., 3., 3., 3., 5.]), "beta": np.zeros(2),
             "s2": 1.0}
    sim = mt.mcmc(model, {"xmat": X}, [inits], 2000, burnin=500, thin=2,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[2]"]["Mean"] - 0.8017) < 0.12


def test_line_with_custom_multivariate():
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: NewMultivarDist(
            mu, s2 * jnp.eye(5)), monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2),
                                                jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 3.0)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1., 6.)], 1)
    inits = {"y": np.array([1., 3., 3., 3., 5.]), "beta": np.zeros(2),
             "s2": 1.0}
    sim = mt.mcmc(model, {"xmat": X}, [inits], 2000, burnin=500, thin=2,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[2]"]["Mean"] - 0.8017) < 0.12


def test_custom_dist_with_custom_bijector():
    """A bounded custom distribution picks up link-transformed sampling."""
    @distribution()
    class Kumaraswamy(UnivariateDistribution):
        a: jax.Array = 2.0
        b: jax.Array = 2.0

        def log_prob(self, x):
            a, b = self.a, self.b
            return (jnp.log(a) + jnp.log(b) + (a - 1) * jnp.log(x)
                    + (b - 1) * jnp.log1p(-x ** a))

        def sample(self, key, shape=()):
            u = jax.random.uniform(key, shape + self.batch_shape)
            return (1 - (1 - u) ** (1 / self.b)) ** (1 / self.a)

        def bijector(self):
            return bij.Sigmoid(0.0, 1.0)

        def in_support(self, x):
            return (x > 0) & (x < 1)

    model = mt.Model(p=mt.Stochastic(lambda: Kumaraswamy(2.0, 3.0)))
    model.set_samplers([mt.NUTS("p")])
    sim = mt.mcmc(model, {}, [{"p": 0.5}], 4000, burnin=500, chains=2,
                  verbose=False)
    comb = sim.combine()
    assert np.all((comb > 0) & (comb < 1))
    # E[X] = b * Beta(1 + 1/a, b) for Kumaraswamy(a, b)
    from scipy.special import beta as betafn
    exact = 3.0 * betafn(1.5, 3.0)
    assert abs(comb.mean() - exact) < 0.03


def test_wishart_node_sampling():
    """Precision-matrix node through the CholeskyPD bijector under NUTS
    (reference pdmatdistribution.jl path)."""
    rng = np.random.default_rng(0)
    Lam_true = np.array([[2.0, 0.6], [0.6, 1.0]])
    y = rng.multivariate_normal(np.zeros(2), np.linalg.inv(Lam_true), 400)

    model = mt.Model(
        y=mt.Stochastic(2, lambda Lam: mt.MvNormalCanon(
            jnp.zeros(2), Lam), monitor=False),
        Lam=mt.Stochastic(2, lambda: mt.Wishart(3.0, jnp.eye(2) / 3.0)),
    )
    model.set_samplers([mt.NUTS("Lam")])
    sim = mt.mcmc(model, {}, [{"y": y, "Lam": np.eye(2)}], 2000, burnin=500,
                  thin=2, chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["Lam[1,1]"]["Mean"] - Lam_true[0, 0]) < 0.35
    assert abs(s["Lam[1,2]"]["Mean"] - Lam_true[0, 1]) < 0.25
    # posterior precision draws stay positive definite
    assert s["Lam[2,2]"]["Mean"] > 0
