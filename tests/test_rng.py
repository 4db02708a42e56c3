"""Bounded-rounds gamma sampler (ops/rng.py): statistical correctness of
the lockstep Marsaglia-Tsang formulation used by conjugate Gibbs blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from mamba_tpu.ops.rng import gamma_bounded, inverse_gamma_bounded


@pytest.mark.parametrize("a", [0.3, 0.75, 1.0, 2.5, 15.05, 75.001, 5000.0])
def test_gamma_bounded_ks(a):
    x = np.asarray(gamma_bounded(jax.random.key(1), jnp.float64(a), (60_000,)))
    assert (x > 0).all()
    _, p = stats.kstest(x, "gamma", args=(a,))
    assert p > 1e-4, (a, p)


def test_gamma_bounded_vector_shape_and_jit():
    av = jnp.array([0.5, 2.0, 80.0])
    x = jax.jit(lambda k: gamma_bounded(k, av, (50_000,)))(jax.random.key(2))
    assert x.shape == (50_000, 3)
    np.testing.assert_allclose(np.asarray(x).mean(0), np.asarray(av),
                               rtol=0.05)


def test_inverse_gamma_bounded_conjugate_shape():
    # the exact (a, b) pair the rats s2_c Gibbs draw uses
    a, b = 75.001, 2700.0
    y = np.asarray(inverse_gamma_bounded(jax.random.key(3), a, b, (120_000,)))
    np.testing.assert_allclose(y.mean(), b / (a - 1.0), rtol=0.01)
    np.testing.assert_allclose(y.std(), b / (a - 1.0) / np.sqrt(a - 2.0),
                               rtol=0.05)


def test_gamma_bounded_matches_jax_random_gamma_distribution():
    # same distribution as the reference implementation (two-sample KS)
    key = jax.random.key(4)
    a = 7.5
    x1 = np.asarray(gamma_bounded(key, jnp.float64(a), (50_000,)))
    x2 = np.asarray(jax.random.gamma(jax.random.key(5), a, (50_000,),
                                     jnp.float64))
    _, p = stats.ks_2samp(x1, x2)
    assert p > 1e-4, p
