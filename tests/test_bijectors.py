"""Bijector round-trip + log-Jacobian tests (Jacobians verified against
autodiff — the reference's closed-form link Jacobians,
src/distributions/transformdistribution.jl, were never unit-tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tpu.ops import bijectors as bij


def assert_close(a, b, rtol=1e-6, atol=1e-9):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


SCALAR_BIJ = [
    bij.Identity(),
    bij.Exp(),
    bij.LowerBounded(jnp.asarray(2.0)),
    bij.UpperBounded(jnp.asarray(3.0)),
    bij.Sigmoid(jnp.asarray(-1.0), jnp.asarray(4.0)),
]


@pytest.mark.parametrize("b", SCALAR_BIJ, ids=lambda b: type(b).__name__)
def test_scalar_roundtrip(b):
    u = jnp.linspace(-2.0, 2.0, 9)
    x = b.forward(u)
    assert_close(b.inverse(x), u, rtol=1e-5)


@pytest.mark.parametrize("b", SCALAR_BIJ, ids=lambda b: type(b).__name__)
def test_scalar_logdet_vs_autodiff(b):
    for u0 in [-1.3, 0.2, 1.7]:
        g = jax.grad(lambda u: b.forward(u))(jnp.asarray(u0))
        assert_close(b.forward_log_det(jnp.asarray(u0)), jnp.log(jnp.abs(g)), rtol=1e-5)


def test_stickbreaking_roundtrip():
    sb = bij.StickBreaking()
    u = jnp.asarray([0.3, -0.5, 1.2])
    x = sb.forward(u)
    assert x.shape == (4,)
    assert_close(jnp.sum(x), 1.0)
    assert np.all(np.asarray(x) > 0)
    assert_close(sb.inverse(x), u, rtol=1e-5)
    # u = 0 -> uniform simplex
    assert_close(sb.forward(jnp.zeros(3)), np.full(4, 0.25), rtol=1e-6)


def test_stickbreaking_logdet_vs_autodiff():
    sb = bij.StickBreaking()
    u = jnp.asarray([0.3, -0.5, 1.2])
    J = jax.jacfwd(lambda v: sb.forward(v)[:-1])(u)
    _, ld_ref = jnp.linalg.slogdet(J)
    assert_close(sb.event_log_det(u, 1), ld_ref, rtol=1e-5)


def test_choleskypd_roundtrip():
    cp = bij.CholeskyPD(3)
    u = jnp.asarray([0.1, 0.4, -0.2, 0.3, 0.5, -0.1])
    x = cp.forward(u)
    assert x.shape == (3, 3)
    assert_close(x, x.T)
    assert np.all(np.linalg.eigvalsh(np.asarray(x)) > 0)
    assert_close(cp.inverse(x), u, rtol=1e-5)


def test_choleskypd_logdet_vs_autodiff():
    cp = bij.CholeskyPD(3)
    u = jnp.asarray([0.1, 0.4, -0.2, 0.3, 0.5, -0.1])
    rows, cols = np.tril_indices(3)

    def packed_forward(v):
        x = cp.forward(v)
        return x[rows, cols]  # independent coordinates of the symmetric output

    J = jax.jacfwd(packed_forward)(u)
    _, ld_ref = jnp.linalg.slogdet(J)
    assert_close(cp.event_log_det(u, 2), ld_ref, rtol=1e-5)


def test_transformed_density_normalizes():
    """Integral of exp(logpdf(forward(u)) + logdet(u)) du == 1 for a Beta."""
    from mamba_tpu.ops.distributions import Beta
    d = Beta(2.0, 3.0)
    b = d.bijector()
    u = jnp.linspace(-12, 12, 4001)
    lp = d.log_prob(b.forward(u)) + b.forward_log_det(u)
    integral = jnp.trapezoid(jnp.exp(lp), u)
    assert_close(integral, 1.0, rtol=1e-4)
