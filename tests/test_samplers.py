"""Stand-alone sampler kernel tests.

Modeled on the reference's doc/samplers/*.jl scripts (SURVEY.md §4) but
upgraded to assertions: each kernel targets a closed-form log-density and the
sample moments must match within Monte-Carlo tolerance.  All kernels are
exercised under jit + lax.scan — the exact engine execution mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tpu.samplers import (amm_init, amm_step, amwg_init, amwg_step,
                                hmc_init, hmc_step, mala_init, mala_step,
                                nuts_init, nuts_step, rwm_init, rwm_step,
                                slice_init, slice_multivariate_step,
                                slice_univariate_step)

MEAN = jnp.array([1.0, -2.0])
SD = jnp.array([1.0, 2.0])


def logf(x):
    return -0.5 * jnp.sum(((x - MEAN) / SD) ** 2)


def logfgrad(x):
    return logf(x), jax.grad(logf)(x)


def run_chain(step_fn, tune, n=4000, x0=None, seed=0):
    x0 = jnp.zeros(2) if x0 is None else x0

    def body(carry, _):
        key, x, tune = carry
        key, sub = jax.random.split(key)
        x, tune = step_fn(sub, x, tune)
        return (key, x, tune), x

    (_, _, tune), xs = jax.jit(lambda c: jax.lax.scan(body, c, length=n))(
        (jax.random.key(seed), x0, tune))
    return np.asarray(xs), tune


def check_moments(xs, atol_mean=0.25, atol_sd=0.35, burn=500):
    xs = xs[burn:]
    np.testing.assert_allclose(xs.mean(0), np.asarray(MEAN), atol=atol_mean)
    np.testing.assert_allclose(xs.std(0), np.asarray(SD), atol=atol_sd)


def test_nuts_standalone():
    key = jax.random.key(1)
    tune = nuts_init(key, jnp.zeros(2), logfgrad)
    assert float(tune.epsilon) > 0
    xs, tune2 = run_chain(
        lambda k, x, t: nuts_step(k, x, t, logfgrad, adapt=t.m < 500),
        tune, n=3000)
    check_moments(xs, burn=600)
    # dual averaging converged to a sane step size
    assert 0.05 < float(tune2.epsilon) < 10.0


def test_nuts_adapt_targets_accept_rate():
    key = jax.random.key(2)
    tune = nuts_init(key, jnp.zeros(2), logfgrad, target=0.8)
    _, tune2 = run_chain(
        lambda k, x, t: nuts_step(k, x, t, logfgrad, adapt=True), tune, n=800)
    accept = float(tune2.alpha) / max(int(tune2.nalpha), 1)
    assert 0.5 < accept <= 1.0


def test_hmc_standalone():
    tune = hmc_init(jnp.zeros(2), epsilon=0.25, L=10)
    xs, _ = run_chain(lambda k, x, t: hmc_step(k, x, t, logfgrad), tune)
    check_moments(xs)


def test_hmc_with_mass_matrix():
    Sigma = jnp.diag(jnp.array([1.0, 4.0]))
    tune = hmc_init(jnp.zeros(2), epsilon=0.25, L=10, Sigma=Sigma)
    xs, _ = run_chain(lambda k, x, t: hmc_step(k, x, t, logfgrad), tune)
    check_moments(xs)


def test_mala_standalone():
    tune = mala_init(jnp.zeros(2), epsilon=0.5)
    xs, _ = run_chain(lambda k, x, t: mala_step(k, x, t, logfgrad), tune, n=6000)
    check_moments(xs, burn=1000)


def test_rwm_standalone():
    tune = rwm_init(jnp.zeros(2), scale=1.0)
    xs, _ = run_chain(lambda k, x, t: rwm_step(k, x, t, logf), tune, n=8000)
    check_moments(xs, burn=1000)


def test_amwg_standalone():
    tune = amwg_init(jnp.zeros(2), sigma=1.0)
    xs, tune2 = run_chain(
        lambda k, x, t: amwg_step(k, x, t, logf, adapt=jnp.asarray(True)),
        tune, n=6000)
    check_moments(xs, burn=1000)
    # scales adapted to a sane range (cumulative-acceptance rule moves both
    # together until rates cross the 0.44 target, so no ordering assert)
    s = np.asarray(tune2.sigma)
    assert np.all((s > 0.3) & (s < 30.0))


def test_amm_standalone():
    tune = amm_init(jnp.zeros(2), Sigma=0.5 * jnp.eye(2))
    xs, _ = run_chain(
        lambda k, x, t: amm_step(k, x, t, logf, adapt=jnp.asarray(True)),
        tune, n=8000)
    check_moments(xs, burn=2000)


def test_slice_univariate_standalone():
    tune = slice_init(jnp.zeros(2), width=4.0)
    xs, _ = run_chain(
        lambda k, x, t: (slice_univariate_step(k, x, t, logf)[0], t), tune)
    check_moments(xs)


def test_slice_multivariate_standalone():
    tune = slice_init(jnp.zeros(2), width=4.0)
    xs, _ = run_chain(
        lambda k, x, t: (slice_multivariate_step(k, x, t, logf)[0], t), tune,
        n=8000)
    check_moments(xs, burn=1000)


def test_nuts_vmaps_over_chains():
    """Per-chain adaptive tune under vmap (SURVEY.md §7 hard parts)."""
    keys = jax.random.split(jax.random.key(3), 4)
    tunes = jax.vmap(lambda k: nuts_init(k, jnp.zeros(2), logfgrad))(keys)

    def one(key, tune):
        def body(carry, _):
            key, x, tune = carry
            key, sub = jax.random.split(key)
            x, tune = nuts_step(sub, x, tune, logfgrad, adapt=True)
            return (key, x, tune), x
        (_, _, tune), xs = jax.lax.scan(body, (key, jnp.zeros(2), tune), length=200)
        return xs, tune

    xs, tunes2 = jax.jit(jax.vmap(one))(keys, tunes)
    assert xs.shape == (4, 200, 2)
    eps = np.asarray(tunes2.epsilon)
    assert np.all(eps > 0) and len(np.unique(eps)) == 4  # independent adaptation


def test_nuts_unrolled_matches_nested(monkeypatch):
    """The two backend-selected doubling-loop formulations
    (utils/backend.py) must produce bit-identical transitions: the unroll
    freezes stopped chains with selects, the while_loop exits — same kept
    values, same tune, same RNG consumption."""
    from mamba_tpu.samplers.nuts import nuts_sub

    def run(unroll_flag, minv):
        monkeypatch.setenv("MAMBA_TPU_UNROLL", unroll_flag)

        def one(key, x):
            return nuts_sub(key, x, jnp.asarray(0.25), logfgrad, minv=minv)

        keys = jax.random.split(jax.random.key(7), 16)
        x0 = jnp.tile(MEAN, (16, 1)) + 0.5
        # fresh jit per flag: the env decision is baked in at trace time
        return jax.jit(jax.vmap(one))(keys, x0)

    for minv in (None, jnp.array([1.0, 4.0])):
        xu, au, nu, du = run("1", minv)
        xn, an, nn, dn = run("0", minv)
        np.testing.assert_array_equal(np.asarray(xu), np.asarray(xn))
        np.testing.assert_array_equal(np.asarray(au), np.asarray(an))
        np.testing.assert_array_equal(np.asarray(nu), np.asarray(nn))
        np.testing.assert_array_equal(np.asarray(du), np.asarray(dn))


def test_slice_unrolled_matches_fori(monkeypatch):
    from mamba_tpu.samplers.slice import slice_init, slice_univariate_step

    tune = slice_init(jnp.zeros(2), width=4.0)

    def run(unroll_flag):
        monkeypatch.setenv("MAMBA_TPU_UNROLL", unroll_flag)

        def one(key, x):
            return slice_univariate_step(key, x, tune, logf)[0]

        keys = jax.random.split(jax.random.key(9), 8)
        return jax.jit(jax.vmap(one))(keys, jnp.tile(MEAN, (8, 1)))

    np.testing.assert_array_equal(np.asarray(run("1")), np.asarray(run("0")))
