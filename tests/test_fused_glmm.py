"""Fused Pallas GLMM likelihood kernel: correctness vs the plain-XLA
oracle (runs in Pallas interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import mamba_tpu as mt
from mamba_tpu.ops.fused_glmm import (
    BernoulliLogitGLMM, bernoulli_logit_glmm_loglik, reference_loglik)


def _data(G=37, n=5, P=4, seed=0):
    rng = np.random.default_rng(seed)
    Xt = jnp.asarray(rng.normal(0, 1, (P, n, G)))
    y = jnp.asarray((rng.random((n, G)) < 0.5).astype(float))
    beta = jnp.asarray(rng.normal(0, 1, P))
    b = jnp.asarray(rng.normal(0, 0.7, G))
    return Xt, y, beta, b


def test_fused_matches_reference_value_and_grads():
    Xt, y, beta, b = _data()   # G=37: exercises the lane-padding path
    lp = bernoulli_logit_glmm_loglik(Xt, y, beta, b)
    np.testing.assert_allclose(float(lp), float(reference_loglik(Xt, y, beta, b)),
                               rtol=1e-10)
    f_fused = lambda be, bb: bernoulli_logit_glmm_loglik(Xt, y, be, bb)
    f_ref = lambda be, bb: reference_loglik(Xt, y, be, bb)
    g_fused = jax.grad(f_fused, argnums=(0, 1))(beta, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(beta, b)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]),
                               rtol=1e-9)


def test_fused_vmaps_over_chains():
    Xt, y, beta, b = _data(G=16)
    C = 6
    rng = np.random.default_rng(3)
    betas = jnp.asarray(rng.normal(0, 1, (C, 4)))
    bs = jnp.asarray(rng.normal(0, 1, (C, 16)))
    fn = jax.vmap(lambda be, bb: jax.value_and_grad(
        lambda be2: bernoulli_logit_glmm_loglik(Xt, y, be2, bb))(be),
        in_axes=(0, 0))
    vals, grads = fn(betas, bs)
    ref = jnp.stack([reference_loglik(Xt, y, betas[i], bs[i])
                     for i in range(C)])
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref), rtol=1e-9)
    assert grads.shape == (C, 4)


def test_fused_glmm_model_matches_generic():
    # the fused build and the generic build define the SAME posterior:
    # identical compiled log densities at identical states
    from mamba_tpu.models import glmm
    G = 24
    # centered=True: this test drives b directly as a stochastic site;
    # the parameterization is orthogonal to the fused-vs-generic parity
    m0, in0, init0, _ = glmm.build(G=G, n=5, seed=1, fused=False,
                                   centered=True)
    m1, in1, init1, _ = glmm.build(G=G, n=5, seed=1, fused=True,
                                   centered=True)
    cm0 = mt.compile_model(m0, in0, init0[0])
    cm1 = mt.compile_model(m1, in1, init1[0])
    rng = np.random.default_rng(7)
    st = {"beta": rng.normal(0, 1, 4), "b": rng.normal(0, 1, G), "s2": 1.3}
    st0 = dict(st, y=np.asarray(init0[0]["y"]))
    st1 = dict(st, y=np.asarray(init1[0]["y"]))
    st0 = {k: jnp.asarray(v, cm0.dtype) for k, v in st0.items()}
    st1 = {k: jnp.asarray(v, cm1.dtype) for k, v in st1.items()}
    np.testing.assert_allclose(float(cm0.logpdf(st0)), float(cm1.logpdf(st1)),
                               rtol=1e-10)
    # block gradient parity (the NUTS leapfrog input)
    for cm, st in ((cm0, st0), (cm1, st1)):
        pack, _, _, logf = cm.block_functions(("beta", "b"), True)
        flat = pack(st)
        val, grad = jax.value_and_grad(logf)(flat, st)
        assert np.isfinite(val) and np.isfinite(np.asarray(grad)).all()


def test_fused_glmm_short_mcmc_recovers():
    from mamba_tpu.models import glmm
    model, inputs, inits, truth = glmm.build(G=64, n=10, seed=2, fused=True,
                                             mass_window=50)
    sim = mt.mcmc(model, inputs, inits, 400, burnin=150, chains=4,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    est = np.array([s[f"beta[{i+1}]"]["Mean"] for i in range(4)])
    assert np.abs(est - truth["beta"]).max() < 0.35


def test_fused_in_support_rejects_nonbinary():
    Xt, y, beta, b = _data(G=16)
    d = BernoulliLogitGLMM(Xt, beta, b)
    assert bool(d.in_support(y))
    bad = y.at[0, 0].set(0.5)
    assert not bool(d.in_support(bad))
    assert np.isneginf(float(d.total_log_prob(bad)))
    assert np.isfinite(float(d.total_log_prob(y)))


def test_fused_rejects_miss_nan_data():
    # MISS imputation writes per-chain y values; the fused kernel shares one
    # y across the chain batch, so NaN (missing) inits must fail loudly at
    # mcmc entry instead of silently using chain 0's data (ADVICE r2).
    import pytest
    from mamba_tpu.models import glmm
    model, inputs, inits, _ = glmm.build(G=16, n=5, seed=3, fused=True)
    y = np.asarray(inits[0]["y"], dtype=float).copy()
    y[0, 0] = np.nan
    inits = [dict(inits[0], y=y)]
    from mamba_tpu.samplers import MISS
    model.set_samplers([MISS("y"), *model.samplers])
    with pytest.raises(ValueError, match="fused|supports_imputation|chain 0"):
        mt.mcmc(model, inputs, inits, 10, burnin=2, chains=2, verbose=False)
