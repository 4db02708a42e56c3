"""Hamiltonian Monte Carlo (reference: src/samplers/hmc.jl).

The leapfrog trajectory runs under ``lax.fori_loop`` with exact autodiff
gradients — one compiled XLA loop instead of the reference's interpreted
per-step graph walks with finite-difference gradients.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .base import SamplerSpec, metropolis_accept


class HMCTune(NamedTuple):
    epsilon: jax.Array
    L: int                       # static leapfrog count
    SigmaL: Optional[jax.Array]  # momentum scale (lower Cholesky), None = I


def hmc_init(x0, epsilon, L, Sigma=None) -> HMCTune:
    dt = jnp.asarray(x0).dtype
    SigmaL = None if Sigma is None else jnp.linalg.cholesky(jnp.asarray(Sigma, dt))
    return HMCTune(epsilon=jnp.asarray(epsilon, dt), L=int(L), SigmaL=SigmaL)


def hmc_step(key, x, tune: HMCTune, logfgrad):
    """Fixed-length leapfrog + MH accept (reference hmc.jl:72-111):
    momentum p ~ SigmaL * N(0, I); kinetic energy 0.5 |SigmaL^-1 p|^2."""
    kp, ka = jax.random.split(key)
    eps = tune.epsilon

    z = jax.random.normal(kp, x.shape, x.dtype)
    p0 = z if tune.SigmaL is None else tune.SigmaL @ z

    logf0, grad0 = logfgrad(x)
    p = p0 + 0.5 * eps * grad0

    def body(_, carry):
        x, p, logf, grad = carry
        x = x + eps * p
        logf, grad = logfgrad(x)
        p = p + eps * grad
        return x, p, logf, grad

    x1, p1, logf1, grad1 = jax.lax.fori_loop(0, tune.L, body, (x, p, logf0, grad0))
    p1 = p1 - 0.5 * eps * grad1  # undo the extra half-step (hmc.jl:96)

    if tune.SigmaL is None:
        K0 = 0.5 * jnp.sum(p0 * p0)
        K1 = 0.5 * jnp.sum(p1 * p1)
    else:
        w0 = jax.scipy.linalg.solve_triangular(tune.SigmaL, p0, lower=True)
        w1 = jax.scipy.linalg.solve_triangular(tune.SigmaL, p1, lower=True)
        K0 = 0.5 * jnp.sum(w0 * w0)
        K1 = 0.5 * jnp.sum(w1 * w1)

    x2, _ = metropolis_accept(ka, (logf1 - K1) - (logf0 - K0), x1, x)
    return x2, tune


class HMC(SamplerSpec):
    transform = True
    needs_grad = True

    def __init__(self, params, epsilon, L, Sigma=None):
        super().__init__(params)
        self.epsilon = epsilon
        self.L = L
        self.Sigma = Sigma

    def kernel_init(self, key, x0, logfgrad):
        return hmc_init(x0, self.epsilon, self.L, self.Sigma)

    def kernel_step(self, key, x, tune, logfgrad, adapt):
        return hmc_step(key, x, tune, logfgrad)
