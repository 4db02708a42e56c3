"""Round-2 parity gaps (VERDICT.md round 1 §missing): batched
Hypergeometric sampling, keys('assigned'), stand-alone kernel validators,
and the default-on ETA progress meter."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mamba_tpu as mt
from mamba_tpu.ops.distributions import Hypergeometric
from mamba_tpu.samplers import (bhmc_init, bia_init, bmc3_init, bmg_init,
                                slicesimplex_init, validate, validatebinary,
                                validatesimplex)
from mamba_tpu.utils.progress import ChainProgress


# -- batched Hypergeometric sampling (reference gets rand free from
#    Distributions.jl, src/Mamba.jl:27-29) -----------------------------------

def test_hypergeometric_batched_sample():
    key = jax.random.key(0)
    ns = jnp.array([7.0, 20.0, 3.0])
    nf = jnp.array([5.0, 10.0, 9.0])
    n = jnp.array([6.0, 15.0, 4.0])
    x = Hypergeometric(ns, nf, n).sample(key, (20000,))
    assert x.shape == (20000, 3)
    want = np.asarray(n * ns / (ns + nf))
    assert np.allclose(np.asarray(x.mean(0)), want, atol=0.1)
    lo = np.maximum(0, np.asarray(n - nf))
    hi = np.minimum(np.asarray(ns), np.asarray(n))
    xv = np.asarray(x)
    assert np.all(xv >= lo) and np.all(xv <= hi)


def test_hypergeometric_sample_under_jit():
    ns = jnp.array([7.0, 20.0])
    f = jax.jit(lambda k: Hypergeometric(ns, 5.0, 4.0).sample(k, (8,)))
    x = f(jax.random.key(1))
    assert x.shape == (8, 2) and np.all(np.asarray(x) >= 0)


def test_hypergeometric_traced_params_raise():
    def f(k, ns):
        return Hypergeometric(ns, 5.0, 4.0).sample(k)
    with pytest.raises(NotImplementedError):
        jax.jit(f)(jax.random.key(0), jnp.asarray(7.0))


# -- keys('assigned') (reference model.jl:74-90) ------------------------------

def test_keys_assigned():
    from mamba_tpu.models import line
    model, inputs, inits = line.build()
    stoch = model.keys("stochastic")
    # no state: inputs only
    assert model.keys("assigned") == sorted(model.input_names)
    # full state: everything
    full = model.keys("assigned", inits[0] if isinstance(inits, list) else inits)
    for n in stoch + model.keys("logical") + sorted(model.input_names):
        assert n in full
    # partial state: inputs + the present stochastics, no logicals
    part = model.keys("assigned", {stoch[0]: 1.0})
    assert stoch[0] in part
    assert not any(n in part for n in model.keys("logical"))


# -- stand-alone variate validators (reference sampler.jl:72-83) --------------

def test_validators():
    x = np.array([0.0, 1.0, 1.0])
    assert validate(object()) is not None
    assert np.all(np.asarray(validatebinary(x)) == x)
    with pytest.raises(ValueError):
        validatebinary(np.array([0.0, 2.0]))
    s = np.array([0.2, 0.3, 0.5])
    assert np.all(np.asarray(validatesimplex(s)) == s)
    with pytest.raises(ValueError):
        validatesimplex(np.array([0.5, 0.9]))


def test_validators_wired_into_inits():
    bad = np.array([0.0, 3.0])
    with pytest.raises(ValueError):
        bhmc_init(jax.random.key(0), bad, 1.0)
    with pytest.raises(ValueError):
        bia_init(bad)
    with pytest.raises(ValueError):
        bmc3_init(bad)
    with pytest.raises(ValueError):
        bmg_init(bad)
    with pytest.raises(ValueError):
        slicesimplex_init(np.array([0.5, 0.9]))
    t = slicesimplex_init(np.array([0.25, 0.75]), scale=0.5)
    assert float(t.scale) == 0.5


def test_validators_pass_traced_values():
    # engine path: traced x can't be host-checked; must not raise
    def f(x):
        return jnp.sum(jnp.asarray(validatebinary(x)))
    assert np.isfinite(float(jax.jit(f)(jnp.array([0.0, 1.0]))))


# -- ETA progress meter (reference progress.jl:5-65) --------------------------

def test_chain_progress_format():
    buf = io.StringIO()
    m = ChainProgress(100, chains=4, stream=buf)
    for _ in range(10):
        m.update(10)
    out = buf.getvalue()
    assert "100 Iterations x 4 Chains" in out
    assert " 10% [" in out and "100% [" in out
    assert "remaining]" in out


def test_progress_defaults_on_with_verbose(capsys):
    from mamba_tpu.models import line
    model, inputs, inits = line.build()
    mt.mcmc(model, inputs, inits, 80, burnin=20, chains=2, verbose=True)
    out = capsys.readouterr().out
    assert "Iterations x 2 Chains" in out and "remaining]" in out
    capsys.readouterr()
    mt.mcmc(model, inputs, inits, 80, burnin=20, chains=2, verbose=False)
    assert "remaining]" not in capsys.readouterr().out


# -- round-4 parity gaps (VERDICT r3 §missing): model-aware link, variadic
#    cat, stored-column keys ------------------------------------------------

def _bounded_model_chains():
    # theta ~ Uniform(2, 8): every sample is positive, so the Chains
    # heuristic would log it — but its true link is the scaled logit
    model = mt.Model(
        y=mt.Stochastic(1, lambda theta: mt.Normal(theta, 1.0), monitor=False),
        theta=mt.Stochastic(lambda: mt.Uniform(2.0, 8.0)),
    )
    model.set_samplers([mt.Slice("theta", 2.0)])
    inits = {"y": jnp.array([4.0, 5.0, 4.5]), "theta": 5.0}
    return mt.mcmc(model, {}, [inits], 300, burnin=100, chains=4,
                   verbose=False)


def test_modelchains_link_uses_node_transform():
    sim = _bounded_model_chains()
    x = np.asarray(sim.value)[:, 0, :]
    linked = sim.link()[:, 0, :]
    p = (x - 2.0) / 6.0
    np.testing.assert_allclose(linked, np.log(p) - np.log1p(-p), rtol=1e-6)
    # the heuristic (plain Chains view of the same draws) gets it wrong
    heur = mt.Chains(sim.value, start=sim.start, thin=sim.thin,
                     names=sim.names, chains=sim.chains).link()[:, 0, :]
    assert not np.allclose(linked, heur)
    np.testing.assert_allclose(heur, np.log(x), rtol=1e-6)
    # and gelmandiag(transform=True) consumes the model-aware values
    mt.gelmandiag(sim, transform=True)


def test_modelchains_keys_filters_to_stored():
    sim = _bounded_model_chains()
    assert sim.keys("monitor") == ["theta"]
    assert sim.keys("stochastic") == ["theta"]   # y not stored
    assert sim.keys("observed") == []


def test_cat_variadic():
    from mamba_tpu.models import line
    model, inputs, inits = line.build()
    a = mt.mcmc(model, inputs, inits, 60, burnin=20, chains=2, verbose=False)
    b = mt.mcmc(model, inputs, inits, 60, burnin=20, chains=2, verbose=False)
    c = mt.mcmc(model, inputs, inits, 60, burnin=20, chains=2, verbose=False)
    out = a.cat(3, b, c)
    assert out.nchains == 6
    assert out.chains == list(range(1, 7))       # relabeled, not duplicated
    np.testing.assert_array_equal(out.value[:, :, 2:4], b.value)
    # dim-1 contiguity is still enforced through the variadic fold
    with pytest.raises(ValueError):
        a.cat(1, b)
