"""User-defined Gibbs block tests (reference Sampler(params, f) contract,
tutorial line.jl:27-45)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt


def test_conjugate_gibbs_line():
    b0 = jnp.zeros(2)
    B0inv = jnp.eye(2) / 1000.0

    def beta_gibbs(key, env):
        X, y, s2 = env["xmat"], env["y"], env["s2"]
        Binv = B0inv + (X.T @ X) / s2
        Sigma = jnp.linalg.inv(Binv)
        mu = Sigma @ (B0inv @ b0 + (X.T @ y) / s2)
        return {"beta": mu + jnp.linalg.cholesky(Sigma)
                @ jax.random.normal(key, (2,))}

    def s2_gibbs(key, env):
        r = env["y"] - env["mu"]
        return {"s2": (0.001 + jnp.dot(r, r) / 2)
                / jax.random.gamma(key, 0.001 + len(r) / 2)}

    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: mt.Normal(mu, jnp.sqrt(s2)),
                        monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2),
                                                jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)))
    model.set_samplers([mt.Gibbs("beta", beta_gibbs),
                        mt.Gibbs("s2", s2_gibbs)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1., 6.)], 1)
    inits = [{"y": np.array([1., 3., 3., 3., 5.]), "beta": np.zeros(2),
              "s2": 1.0}]
    sim = mt.mcmc(model, {"xmat": X}, inits, 5000, burnin=250, thin=2,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[1]"]["Mean"] - 0.5971) < 0.12
    assert abs(s["beta[2]"]["Mean"] - 0.8017) < 0.05
    assert abs(s["s2"]["Mean"] - 1.2204) < 0.6
    # conjugate draws are iid given the other block -> near-maximal ESS
    assert s["beta[1]"]["ESS"] > 2000


def test_gibbs_rejects_foreign_nodes():
    model = mt.Model(
        a=mt.Stochastic(lambda: mt.Normal(0.0, 1.0)),
        b=mt.Stochastic(lambda: mt.Normal(0.0, 1.0)))
    model.set_samplers([
        mt.Gibbs("a", lambda key, env: {"a": 0.0, "b": 1.0}),
        mt.RWM("b", 0.5)])
    with pytest.raises(ValueError, match="non-block"):
        mt.mcmc(model, {}, [{"a": 0.0, "b": 0.0}], 10, verbose=False)
