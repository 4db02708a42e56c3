"""MAP / ADVI / SMC backend tests (capabilities beyond the reference's MCMC;
maxpost parity with the fork's src/maxpost/maxpost.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import mamba_tpu as mt
from mamba_tpu.models import line


def conjugate_model():
    y = np.array([1.1, 0.7, 1.4, 0.9, 1.2, 1.0, 0.8, 1.3])
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu: mt.Normal(mu * jnp.ones(8), 1.0),
                        monitor=False),
        mu=mt.Stochastic(lambda: mt.Normal(0.0, jnp.sqrt(2.0))))
    model.set_samplers([mt.NUTS("mu")])
    v = 1 / (8 + 0.5)
    return model, y, v * y.sum(), np.sqrt(v)


def test_map_line():
    model, inputs, inits = line.build()
    r = mt.optim_over(model, inputs, inits[0])
    # MAP of beta == OLS fit under the flat-ish prior
    np.testing.assert_allclose(r.params["beta"], [0.6, 0.8], atol=0.02)
    assert r.params["s2"] > 0
    assert np.isfinite(r.logpdf)


def test_map_as_warm_start():
    model, inputs, inits = line.build()
    r = mt.optim_over(model, inputs, inits[0])
    y = np.array([1., 3., 3., 3., 5.])
    sim = mt.mcmc(model, inputs, [r.as_inits({"y": y})], 400, burnin=100,
                  chains=1, verbose=False)
    assert np.all(np.isfinite(sim.value))


def test_advi_conjugate():
    model, y, m_exact, sd_exact = conjugate_model()
    a = mt.advi(model, {}, {"y": y, "mu": 0.0}, steps=3000, lr=0.05)
    assert abs(float(a.mu[0]) - m_exact) < 0.05
    assert abs(float(jnp.exp(a.log_sigma[0])) - sd_exact) < 0.06
    # ELBO increased
    assert a.elbo_trace[-50:].mean() > a.elbo_trace[:50].mean()
    draws = a.sample(jax.random.key(0), 4000)
    assert abs(np.asarray(draws["mu"]).mean() - m_exact) < 0.05


def test_advi_warm_start_line():
    model, inputs, inits = line.build()
    a = mt.advi(model, inputs, inits[0], steps=2000, lr=0.05)
    ms = a.mean_state()
    assert abs(ms["beta"][1] - 0.8) < 0.25
    assert ms["s2"] > 0


def test_advi_mass_warm_started_nuts():
    # ADVI variational variances seed NUTS's diagonal inverse mass
    # (minv0); the warm-started run must still hit the golden posterior.
    model, inputs, inits = line.build()
    a = mt.advi(model, inputs, inits[0], steps=2000, lr=0.05)
    var = a.unconstrained_variances()
    assert set(var) == {"beta", "s2"}
    assert var["beta"].shape == (2,) and np.all(var["beta"] > 0)
    minv0 = np.ravel(var["beta"])
    model.set_samplers([mt.NUTS("beta", minv0=minv0), mt.Slice("s2", 2.0)])
    sim = mt.mcmc(model, inputs, a.as_inits(inits[0]), 1500, burnin=500,
                  chains=4, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[2]"]["Mean"] - 0.8) < 0.2
    # the seeded mass survives the run un-refreshed (mass_window=0)
    tune = sim.states["tunes"][0]
    np.testing.assert_allclose(np.asarray(tune.minv)[0], minv0, rtol=1e-6)


@pytest.mark.slow
def test_smc_conjugate_exact():
    model, y, m_exact, sd_exact = conjugate_model()
    r = mt.smc(model, {}, {"y": y, "mu": 0.0}, n_particles=4096, seed=2)
    mu = r.particles["mu"]
    assert abs(mu.mean() - m_exact) < 0.03
    assert abs(mu.std() - sd_exact) < 0.04
    S = np.eye(8) + 2.0 * np.ones((8, 8))
    logZ_exact = stats.multivariate_normal(np.zeros(8), S).logpdf(y)
    assert abs(r.log_evidence - logZ_exact) < 0.3
    assert r.n_stages <= 5


@pytest.mark.slow
def test_smc_line_posterior():
    model, inputs, inits = line.build()
    r = mt.smc(model, inputs, inits[0], n_particles=4096,
               rejuvenation_steps=50, seed=3)
    b = r.particles["beta"].mean(0)
    assert abs(b[0] - 0.60) < 0.35
    assert abs(b[1] - 0.80) < 0.12
    assert 1.0 <= r.n_stages <= 30


def test_smc_sharded_particles():
    """Particle axis sharded over the 8-device CPU mesh."""
    from mamba_tpu.parallel import make_mesh
    model, y, m_exact, _ = conjugate_model()
    mesh = make_mesh({"chains": 8})
    r = mt.smc(model, {}, {"y": y, "mu": 0.0}, n_particles=1024, mesh=mesh,
               seed=4)
    assert abs(r.particles["mu"].mean() - m_exact) < 0.06
