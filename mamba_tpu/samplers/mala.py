"""Metropolis-adjusted Langevin algorithm (reference: src/samplers/mala.jl).

Gradients are exact JAX autodiff of the compiled block log-density — the
reference uses finite differences (simulation.jl:47-51), n+1 log-density
evaluations per gradient; here one fused reverse-mode pass.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .base import SamplerSpec, metropolis_accept


class MALATune(NamedTuple):
    epsilon: jax.Array
    SigmaL: Optional[jax.Array]  # lower-Cholesky of Sigma, or None for identity


def mala_init(x0, epsilon, Sigma=None) -> MALATune:
    dt = jnp.asarray(x0).dtype
    SigmaL = None if Sigma is None else jnp.linalg.cholesky(jnp.asarray(Sigma, dt))
    return MALATune(epsilon=jnp.asarray(epsilon, dt), SigmaL=SigmaL)


def mala_step(key, x, tune: MALATune, logfgrad):
    """Proposal y = x + (eps/2) Sigma grad + sqrt(eps) SigmaL z with the
    asymmetric-proposal MH correction (reference mala.jl:67-86)."""
    kp, ka = jax.random.split(key)
    eps = tune.epsilon
    z = jax.random.normal(kp, x.shape, x.dtype)

    if tune.SigmaL is None:
        def drift(g):
            return 0.5 * eps * g

        def noise(z):
            return jnp.sqrt(eps) * z

        def sqnorm_Linv(v):
            return jnp.sum(v * v) / eps
    else:
        L = tune.SigmaL

        def drift(g):
            return 0.5 * eps * (L @ (L.T @ g))

        def noise(z):
            return jnp.sqrt(eps) * (L @ z)

        def sqnorm_Linv(v):
            w = jax.scipy.linalg.solve_triangular(L, v, lower=True)
            return jnp.sum(w * w) / eps

    logf0, grad0 = logfgrad(x)
    y = x + drift(grad0) + noise(z)
    logf1, grad1 = logfgrad(y)

    q0 = -0.5 * sqnorm_Linv(x - y - drift(grad1))
    q1 = -0.5 * sqnorm_Linv(y - x - drift(grad0))
    x2, _ = metropolis_accept(ka, (logf1 - q1) - (logf0 - q0), y, x)
    return x2, tune


class MALA(SamplerSpec):
    transform = True
    needs_grad = True

    def __init__(self, params, epsilon, Sigma=None):
        super().__init__(params)
        self.epsilon = epsilon
        self.Sigma = Sigma

    def kernel_init(self, key, x0, logfgrad):
        return mala_init(x0, self.epsilon, self.Sigma)

    def kernel_step(self, key, x, tune, logfgrad, adapt):
        return mala_step(key, x, tune, logfgrad)
