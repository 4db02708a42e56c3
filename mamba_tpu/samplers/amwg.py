"""Adaptive Metropolis-within-Gibbs (reference: src/samplers/amwg.jl).

Per-coordinate random-walk sweep with batch adaptation of proposal scales
toward a 0.44 acceptance target.  The coordinate sweep is a
``lax.fori_loop`` with in-place functional updates; all adaptation state is
a pytree so the kernel vmaps over chains (each chain adapts independently —
same semantics as the reference's per-process chains).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import SamplerSpec


class AMWGTune(NamedTuple):
    sigma: jax.Array    # per-coordinate proposal std
    accept: jax.Array   # per-coordinate acceptance counts since adapt start
    m: jax.Array        # iterations since adapt start
    batchsize: int
    target: float


def amwg_init(x0, sigma, batchsize: int = 50, target: float = 0.44) -> AMWGTune:
    x0 = jnp.asarray(x0)
    sigma = jnp.broadcast_to(jnp.asarray(sigma, x0.dtype), x0.shape)
    return AMWGTune(sigma=sigma, accept=jnp.zeros(x0.shape, jnp.int32),
                    m=jnp.asarray(0, jnp.int32), batchsize=int(batchsize),
                    target=float(target))


def amwg_step(key, x, tune: AMWGTune, logf, adapt):
    """One coordinate sweep + (on adapt steps) batch scale update
    (reference amwg.jl:68-115)."""
    n = x.shape[0]
    kz, ku = jax.random.split(key)
    z = tune.sigma * jax.random.normal(kz, x.shape, x.dtype)
    us = jax.random.uniform(ku, x.shape, x.dtype)

    def coord(i, carry):
        x, logf0, accept = carry
        y = x.at[i].add(z[i])
        logf1 = logf(y)
        acc = jnp.log(us[i]) < logf1 - logf0
        x = jnp.where(acc, y, x)
        logf0 = jnp.where(acc, logf1, logf0)
        accept = accept.at[i].add(jnp.where(acc & adapt, 1, 0))
        return x, logf0, accept

    x2, _, accept = jax.lax.fori_loop(0, n, coord, (x, logf(x), tune.accept))

    m = tune.m + jnp.where(adapt, 1, 0)
    at_batch = adapt & (m % tune.batchsize == 0) & (m > 0)
    mf = m.astype(x.dtype)
    delta = jnp.minimum(0.01, (mf / tune.batchsize) ** -0.5)
    eps = jnp.where(accept / jnp.maximum(mf, 1.0) < tune.target, -delta, delta)
    sigma = jnp.where(at_batch, tune.sigma * jnp.exp(eps), tune.sigma)

    return x2, AMWGTune(sigma=sigma, accept=accept, m=m,
                        batchsize=tune.batchsize, target=tune.target)


class AMWG(SamplerSpec):
    """AMWG(params, sigma; batchsize=50, target=0.44, adapt='all') — samples
    in link-transformed space (reference amwg.jl:52-57)."""

    transform = True

    def __init__(self, params, sigma, batchsize: int = 50, target: float = 0.44,
                 adapt: str = "all"):
        super().__init__(params)
        if adapt not in ("all", "burnin", "none"):
            raise ValueError("adapt must be one of 'all', 'burnin', 'none'")
        self.sigma = sigma
        self.batchsize = batchsize
        self.target = target
        self.adapt_mode = adapt

    def kernel_init(self, key, x0, logf):
        return amwg_init(x0, self.sigma, self.batchsize, self.target)

    def kernel_step(self, key, x, tune, logf, adapt):
        isadapt = {"all": jnp.asarray(True),
                   "none": jnp.asarray(False),
                   "burnin": adapt}[self.adapt_mode]
        return amwg_step(key, x, tune, logf, isadapt)
