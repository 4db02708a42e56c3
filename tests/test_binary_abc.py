"""Binary samplers (BHMC, BIA, BMC3, BMG) and ABC kernel tests.

Targets a 3-bit distribution with known exact probabilities (the analog of
the reference's doc/samplers/{bhmc,bia,bmc3,bmg}.jl scripts, upgraded to
frequency assertions), and a conjugate-normal ABC check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt
from mamba_tpu.samplers import (bhmc_init, bhmc_step, bia_init, bia_step,
                                bmc3_init, bmc3_step, bmg_init, bmg_step)

# target over {0,1}^3: independent bits with P(x_i=1) = (0.8, 0.5, 0.2)
P1 = jnp.array([0.8, 0.5, 0.2])


def logf(x):
    return jnp.sum(x * jnp.log(P1) + (1 - x) * jnp.log(1 - P1))


def run_binary(step_fn, tune, n=6000, seed=0):
    def body(carry, _):
        key, x, tune = carry
        key, sub = jax.random.split(key)
        x, tune = step_fn(sub, x, tune)
        return (key, x, tune), x

    (_, _, _), xs = jax.jit(lambda c: jax.lax.scan(body, c, length=n))(
        (jax.random.key(seed), jnp.zeros(3), tune))
    return np.asarray(xs)


def check_marginals(xs, atol=0.05, burn=500):
    freq = xs[burn:].mean(0)
    np.testing.assert_allclose(freq, np.asarray(P1), atol=atol)


def test_bmc3():
    xs = run_binary(lambda k, x, t: bmc3_step(k, x, t, logf),
                    bmc3_init(jnp.zeros(3), k=1))
    check_marginals(xs)
    assert set(np.unique(xs)) <= {0.0, 1.0}


def test_bmc3_group_form():
    tune = bmc3_init(jnp.zeros(3), k=[[0], [1], [2], [0, 1, 2]])
    xs = run_binary(lambda k, x, t: bmc3_step(k, x, t, logf), tune)
    check_marginals(xs)


def test_bmc3_k_validation():
    with pytest.raises(ValueError):
        bmc3_init(jnp.zeros(3), k=5)


def test_bmg():
    xs = run_binary(lambda k, x, t: bmg_step(k, x, t, logf),
                    bmg_init(jnp.zeros(3), k=1))
    check_marginals(xs)


def test_bmg_k2_proposal_corrected():
    xs = run_binary(lambda k, x, t: bmg_step(k, x, t, logf),
                    bmg_init(jnp.zeros(3), k=2))
    check_marginals(xs)


def test_bia_adapts_and_targets():
    tune = bia_init(jnp.zeros(3))
    xs = run_binary(lambda k, x, t: bia_step(k, x, t, logf), tune, n=8000)
    check_marginals(xs, atol=0.06, burn=2000)


def test_bhmc():
    key = jax.random.key(42)
    tune = bhmc_init(key, jnp.zeros(3), traveltime=1.5 * np.pi)
    xs = run_binary(lambda k, x, t: bhmc_step(k, x, t, logf), tune, n=6000)
    check_marginals(xs, atol=0.06)


def test_bhmc_counters_advance():
    key = jax.random.key(1)
    tune = bhmc_init(key, jnp.zeros(3), traveltime=2 * np.pi)
    x, tune2 = jax.jit(lambda k, x, t: bhmc_step(k, x, t, logf))(
        key, jnp.zeros(3), tune)
    assert int(tune2.wallhits) > 0


# ---------------------------------------------------------------------------
# ABC on a conjugate model: y ~ N(mu, 1), mu ~ N(0, 10); with mean summary
# and tight tolerance the ABC posterior approximates the exact one.
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_abc_conjugate_normal():
    y = np.array([0.8, 1.2, 1.1, 0.9, 1.3, 0.7, 1.0, 1.05])
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu: mt.Normal(mu * jnp.ones(len(y)), 1.0),
                        monitor=False),
        mu=mt.Stochastic(lambda: mt.Normal(0.0, jnp.sqrt(10.0))),
    )
    model.set_samplers([mt.ABC("mu", scale=0.5,
                               summary=lambda x: jnp.mean(x),
                               epsilon=0.25, maxdraw=10, nsim=3)])
    sim = mt.mcmc(model, {}, [{"y": y, "mu": 0.0}], 4000, burnin=1000,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    n = len(y)
    post_mean = y.sum() / (n + 1 / 10.0)       # exact conjugate posterior
    assert abs(s["mu"]["Mean"] - post_mean) < 0.25
    assert s["mu"]["SD"] < 1.0
    # chain actually moves
    assert mt.changerate(sim).value[0, 0, 0] > 0.05


def test_abc_requires_data_targets():
    model = mt.Model(mu=mt.Stochastic(lambda: mt.Normal(0.0, 1.0)))
    model.set_samplers([mt.ABC("mu", 1.0, lambda x: x, 0.1)])
    from mamba_tpu.model.compile import compile_model
    cm = compile_model(model, {}, {"mu": 0.0})
    with pytest.raises(ValueError, match="data targets"):
        model.samplers[0].build(cm)
