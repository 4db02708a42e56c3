"""Adaptive Mixture Metropolis (reference: src/samplers/amm.jl).

Haario-style adaptive Metropolis: beta-mixture of a fixed proposal and a
running empirical-covariance proposal.  The reference guards rank deficiency
with a pivoted Cholesky (amm.jl:87-89); here we attempt a batched
``jnp.linalg.cholesky`` each step and keep the previous factor whenever the
empirical covariance is not (numerically) PD — same effect, branch-free and
vmappable across chains.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import SamplerSpec, metropolis_accept


class AMMTune(NamedTuple):
    SigmaL: jax.Array    # fixed proposal Cholesky
    SigmaLm: jax.Array   # adaptive (empirical) proposal Cholesky
    Mv: jax.Array        # running mean
    Mvv: jax.Array       # running second moment
    m: jax.Array
    beta: float
    scale: float


def amm_init(x0, Sigma, beta: float = 0.05, scale: float = 2.38) -> AMMTune:
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    SigmaL = jnp.linalg.cholesky(jnp.asarray(Sigma, x0.dtype))
    return AMMTune(SigmaL=SigmaL, SigmaLm=jnp.zeros((n, n), x0.dtype),
                   Mv=x0, Mvv=jnp.outer(x0, x0), m=jnp.asarray(0, jnp.int32),
                   beta=float(beta), scale=float(scale))


def amm_step(key, x, tune: AMMTune, logf, adapt):
    n = x.shape[0]
    k1, k2, ka = jax.random.split(key, 3)

    dz = tune.SigmaL @ jax.random.normal(k1, (n,), x.dtype)
    dz_m = tune.SigmaLm @ jax.random.normal(k2, (n,), x.dtype)
    use_mix = tune.m > 2 * n
    step = jnp.where(use_mix, tune.beta * dz + (1.0 - tune.beta) * dz_m, dz)
    y = x + step
    x2, _ = metropolis_accept(ka, logf(y) - logf(x), y, x)

    # adaptation (reference amm.jl:81-91) — uses the post-accept value
    mf = (tune.m + 1).astype(x.dtype)
    p = mf / (mf + 1.0)
    Mv = p * tune.Mv + (1.0 - p) * x2
    Mvv = p * tune.Mvv + (1.0 - p) * jnp.outer(x2, x2)
    Sigma_emp = (tune.scale ** 2 / n / p) * (Mvv - jnp.outer(Mv, Mv))
    L_new = jnp.linalg.cholesky(Sigma_emp)
    ok = jnp.all(jnp.isfinite(L_new))
    SigmaLm = jnp.where(ok, jnp.where(adapt, L_new, tune.SigmaLm), tune.SigmaLm)

    Mv = jnp.where(adapt, Mv, tune.Mv)
    Mvv = jnp.where(adapt, Mvv, tune.Mvv)
    m = tune.m + jnp.where(adapt, 1, 0)
    return x2, AMMTune(SigmaL=tune.SigmaL, SigmaLm=SigmaLm, Mv=Mv, Mvv=Mvv,
                       m=m, beta=tune.beta, scale=tune.scale)


class AMM(SamplerSpec):
    """AMM(params, Sigma; beta=0.05, scale=2.38, adapt='all') — samples in
    link-transformed space (reference amm.jl:50-55)."""

    transform = True

    def __init__(self, params, Sigma, beta: float = 0.05, scale: float = 2.38,
                 adapt: str = "all"):
        super().__init__(params)
        if adapt not in ("all", "burnin", "none"):
            raise ValueError("adapt must be one of 'all', 'burnin', 'none'")
        self.Sigma = Sigma
        self.beta = beta
        self.scale = scale
        self.adapt_mode = adapt

    def kernel_init(self, key, x0, logf):
        return amm_init(x0, self.Sigma, self.beta, self.scale)

    def kernel_step(self, key, x, tune, logf, adapt):
        isadapt = {"all": jnp.asarray(True),
                   "none": jnp.asarray(False),
                   "burnin": adapt}[self.adapt_mode]
        return amm_step(key, x, tune, logf, isadapt)
