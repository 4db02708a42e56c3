"""Engine integration tests: the tutorial line model end-to-end.

The reference's only line-model test is running the doc script
(test/runtests.jl tutorialtests); here we assert posterior moments against
the golden table in doc/tutorial.rst:432-442 within Monte-Carlo error, plus
engine mechanics the reference never unit-tested: determinism, restart
continuity, thin/burnin bookkeeping, and query API.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt


def line_model():
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: mt.Normal(mu, jnp.sqrt(s2)),
                        monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2), jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    X = jnp.stack([jnp.ones(5), jnp.arange(1., 6.)], 1)
    y = jnp.array([1., 3., 3., 3., 5.])
    rng = np.random.default_rng(42)
    inits = [{"y": y, "beta": rng.normal(0, 1, 2), "s2": rng.gamma(1.0)}
             for _ in range(3)]
    return model, {"xmat": X}, inits


def test_line_golden_posterior():
    """Golden stats from doc/tutorial.rst:432-442: beta[1] 0.5971 (SD 1.15),
    beta[2] 0.8017 (SD 0.35), s2 1.2204."""
    model, inputs, inits = line_model()
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 3.0)])
    sim = mt.mcmc(model, inputs, inits, 5000, burnin=250, thin=2, chains=3,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[1]"]["Mean"] - 0.5971) < 0.15
    assert abs(s["beta[2]"]["Mean"] - 0.8017) < 0.05
    assert abs(s["s2"]["Mean"] - 1.2204) < 0.45
    assert abs(s["beta[1]"]["SD"] - 1.1489) < 0.25
    assert s["beta[1]"]["ESS"] > 500
    q = mt.quantile(sim).to_dict()
    assert q["beta[2]"]["2.5%"] < 0.8017 < q["beta[2]"]["97.5%"]


def test_engine_deterministic():
    model, inputs, inits = line_model()
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 3.0)])
    a = mt.mcmc(model, inputs, inits, 200, burnin=50, thin=1, chains=2,
                seed=7, verbose=False)
    b = mt.mcmc(model, inputs, inits, 200, burnin=50, thin=1, chains=2,
                seed=7, verbose=False)
    np.testing.assert_array_equal(a.value, b.value)
    c = mt.mcmc(model, inputs, inits, 200, burnin=50, thin=1, chains=2,
                seed=8, verbose=False)
    assert not np.array_equal(a.value, c.value)


def test_engine_cache_reuse_and_invalidation():
    """The cross-call engine cache (model/mcmc.py _cache_key, r4 verdict
    #5) must (a) reuse the compiled programs on an identical repeat call,
    (b) hit on same-CONTENT inputs regardless of array identity, and
    (c) miss when input contents or the sampler scheme change."""
    model, inputs, inits = line_model()
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 3.0)])
    a = mt.mcmc(model, inputs, inits, 100, burnin=30, chains=2, seed=3,
                verbose=False)
    cache = model._engine_cache
    assert len(cache) == 1
    ent = next(iter(cache.values()))
    assert ent["jitted"], "scan programs should be cached after a run"
    b = mt.mcmc(model, inputs, inits, 100, burnin=30, chains=2, seed=3,
                verbose=False)
    np.testing.assert_array_equal(a.value, b.value)
    assert len(cache) == 1 and next(iter(cache.values())) is ent
    # same content, different array object -> hit
    inputs_same = {"xmat": np.asarray(inputs["xmat"]).copy()}
    mt.mcmc(model, inputs_same, inits, 100, burnin=30, chains=2,
            verbose=False)
    assert len(cache) == 1
    # changed input content -> miss (inputs are baked as constants)
    inputs_new = {"xmat": np.asarray(inputs["xmat"]) + 1.0}
    mt.mcmc(model, inputs_new, inits, 100, burnin=30, chains=2,
            verbose=False)
    assert len(cache) == 2
    # changed sampler scheme -> miss
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 3.0)])
    mt.mcmc(model, inputs, inits, 100, burnin=30, chains=2, verbose=False)
    assert len(cache) == 3


def test_restart_continues_chain():
    model, inputs, inits = line_model()
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 3.0)])
    sim = mt.mcmc(model, inputs, inits, 400, burnin=100, thin=2, chains=2,
                  verbose=False)
    assert sim.iter == 400
    sim2 = mt.mcmc(sim, 200)
    assert sim2.iter == 600
    assert sim2.niter == sim.niter + 100
    np.testing.assert_array_equal(sim2.value[:sim.niter], sim.value)
    rng = sim2.range
    assert rng[0] == 102 and rng[-1] == 600 and np.all(np.diff(rng) == 2)
    # restart reuses the adapted NUTS step size (tune continuation,
    # reference sampler.jl:37-47)
    eps_before = np.asarray(sim.states["tunes"][0].epsilon)
    eps_after = np.asarray(sim2.states["tunes"][0].epsilon)
    np.testing.assert_array_equal(eps_before, eps_after)


def test_thin_burnin_bookkeeping():
    model, inputs, inits = line_model()
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 3.0)])
    sim = mt.mcmc(model, inputs, inits, 1000, burnin=200, thin=4, chains=1,
                  verbose=False)
    assert sim.niter == 200
    assert sim.range[0] == 204 and sim.range[-1] == 1000
    assert sim.value.shape == (200, 3, 1)   # beta[1], beta[2], s2


def test_monitor_flags_respected():
    model, inputs, inits = line_model()
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 3.0)])
    sim = mt.mcmc(model, inputs, inits, 100, burnin=20, chains=1, verbose=False)
    assert sim.names == ["beta[1]", "beta[2]", "s2"]  # y, mu unmonitored


def test_chains_indexing():
    model, inputs, inits = line_model()
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 3.0)])
    sim = mt.mcmc(model, inputs, inits, 300, burnin=100, thin=2, chains=3,
                  verbose=False)
    sub = sim[:, "beta", :]
    assert sub.names == ["beta[1]", "beta[2]"]
    sub2 = sim[:, ["s2"], [0, 2]]
    assert sub2.value.shape == (100, 1, 2)
    win = sim[200:, :, :]
    assert win.range[0] >= 200


def test_model_queries():
    model, _, _ = line_model()
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 3.0)])
    assert model.keys("stochastic") == ["beta", "s2", "y"] or \
        set(model.keys("stochastic")) == {"beta", "s2", "y"}
    assert set(model.keys("input")) == {"xmat"}
    assert model.keys("block", 1) == ["beta"]
    assert set(model.keys("sampled")) == {"beta", "s2"}
    assert model.keys("observed") == ["y"]
    dot = model.graph2dot()
    assert '"beta" -> "mu"' in dot and '"xmat" [shape=box' in dot
