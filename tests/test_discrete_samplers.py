"""DGS / SliceSimplex / MISS kernel tests against exact distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt
from mamba_tpu.samplers import discrete_step
from mamba_tpu.samplers.dgs import DGSTune, dgs_step
from mamba_tpu.samplers.slicesimplex import SliceSimplexTune, slicesimplex_step


def test_discrete_step_exact_masses():
    """Stand-alone DiscreteVariate form (reference dgs.jl:129-133)."""
    support = jnp.array([0.0, 1.0, 2.0])
    mass = jnp.array([0.2, 0.5, 0.3])
    keys = jax.random.split(jax.random.key(0), 6000)
    draws = jax.vmap(lambda k: discrete_step(k, support, mass))(keys)
    freqs = np.array([(np.asarray(draws) == v).mean() for v in [0, 1, 2]])
    np.testing.assert_allclose(freqs, [0.2, 0.5, 0.3], atol=0.02)


def test_dgs_step_matches_conditional():
    """DGS over a 2-element vector with independent known masses."""
    logp = jnp.log(jnp.array([[0.1, 0.9], [0.7, 0.3]]))

    def logf(x):
        i0 = x[0].astype(jnp.int32)
        i1 = x[1].astype(jnp.int32)
        return logp[0, i0] + logp[1, i1]

    tune = DGSTune(support=jnp.tile(jnp.array([0.0, 1.0]), (2, 1)),
                   mask=jnp.ones((2, 2), bool))

    def one(k, x):
        x2, _ = dgs_step(k, x, tune, logf)
        return x2

    keys = jax.random.split(jax.random.key(1), 4000)
    draws = jax.jit(jax.vmap(one, in_axes=(0, None)))(keys, jnp.zeros(2))
    d = np.asarray(draws)
    np.testing.assert_allclose(d[:, 0].mean(), 0.9, atol=0.03)
    np.testing.assert_allclose(d[:, 1].mean(), 0.3, atol=0.03)


def test_dgs_ragged_support_masked():
    """Per-element support sizes differ -> padded grid + mask."""
    tune = DGSTune(support=jnp.array([[0.0, 1.0, 2.0], [0.0, 1.0, 0.0]]),
                   mask=jnp.array([[True, True, True], [True, True, False]]))

    def logf(x):
        return jnp.asarray(0.0)   # uniform over valid support

    keys = jax.random.split(jax.random.key(2), 3000)
    draws = jax.jit(jax.vmap(lambda k: dgs_step(k, jnp.zeros(2), tune, logf)[0])
                    )(keys)
    d = np.asarray(draws)
    assert set(np.unique(d[:, 0])) == {0.0, 1.0, 2.0}
    assert set(np.unique(d[:, 1])) == {0.0, 1.0}
    np.testing.assert_allclose((d[:, 1] == 1.0).mean(), 0.5, atol=0.03)


def test_slicesimplex_targets_dirichlet():
    """SliceSimplex on a Dirichlet(3,1,1) density recovers its mean."""
    alpha = jnp.array([3.0, 1.0, 1.0])

    def logf(x):
        return jnp.sum((alpha - 1) * jnp.log(jnp.clip(x, 1e-12)))

    tune = SliceSimplexTune(scale=jnp.asarray(0.7))

    def body(carry, _):
        key, x = carry
        key, sub = jax.random.split(key)
        x, _ = slicesimplex_step(sub, x, tune, logf)
        return (key, x), x

    (_, _), xs = jax.jit(lambda c: jax.lax.scan(body, c, length=4000))(
        (jax.random.key(3), jnp.ones(3) / 3))
    xs = np.asarray(xs)[500:]
    np.testing.assert_allclose(xs.sum(1), 1.0, atol=1e-8)
    np.testing.assert_allclose(xs.mean(0), [0.6, 0.2, 0.2], atol=0.05)


def test_miss_imputes_nan_entries():
    """NaN observations get imputed; observed entries stay fixed."""
    y = np.array([1.0, 3.0, np.nan, 3.0, np.nan])
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: mt.Normal(mu, jnp.sqrt(s2))),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2),
                                                jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    model.set_samplers([mt.MISS("y"), mt.HMC("beta", 0.1, 10),
                        mt.Slice("s2", 3.0)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1., 6.)], 1)
    inits = [{"y": y, "beta": np.zeros(2), "s2": 1.0}]
    sim = mt.mcmc(model, {"xmat": X}, inits, 600, burnin=100, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    # observed entries constant, imputed entries vary
    assert s["y[1]"]["SD"] == 0.0 and s["y[4]"]["SD"] == 0.0
    assert s["y[3]"]["SD"] > 0.1 and s["y[5]"]["SD"] > 0.1
    # imputations track the regression line
    assert abs(s["y[3]"]["Mean"] - 3.0) < 1.5
    assert abs(s["y[5]"]["Mean"] - 5.0) < 2.5
    assert np.all(np.isfinite(sim.value))


def test_dgs_requires_discrete_node():
    model = mt.Model(a=mt.Stochastic(lambda: mt.Normal(0.0, 1.0)))
    model.set_samplers([mt.DGS("a")])
    from mamba_tpu.model.compile import compile_model
    cm = compile_model(model, {}, {"a": 0.0})
    with pytest.raises(ValueError, match="discrete"):
        model.samplers[0].build(cm)
