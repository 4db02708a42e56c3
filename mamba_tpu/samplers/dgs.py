"""Discrete Gibbs sampler: exact full-conditional draws over finite supports.

TPU-native counterpart of reference src/samplers/dgs.jl.  The reference
enumerates each element's support dynamically per call (dgs.jl:109-126);
XLA needs static shapes, so the support grid is resolved ONCE at build time
from the compiled model's example distributions (pad + mask for ragged
per-element supports — SURVEY.md §7 hard parts).  The per-element sweep is a
``lax.fori_loop``; all K candidate full-conditional densities evaluate as
one vmapped batch (the reference's serial mass() loop, dgs.jl:112-117).

Sampling uses the Gumbel-max trick on the candidate log-masses; when every
candidate is -inf the draw falls back to uniform, matching the reference's
``psum <= 0`` branch (dgs.jl:118-122).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerSpec


class DGSTune(NamedTuple):
    support: jax.Array   # (n_elem, K) candidate values (padded)
    mask: jax.Array      # (n_elem, K) valid-candidate mask


def dgs_support(dist, shape) -> DGSTune:
    """Static support grid of a (possibly batched) discrete distribution."""
    lo, hi = dist.support_bounds()
    lo = np.broadcast_to(np.asarray(lo, dtype=np.int64), shape).reshape(-1)
    hi = np.broadcast_to(np.asarray(hi, dtype=np.int64), shape).reshape(-1)
    if np.any(~np.isfinite(hi.astype(float))) or np.any(~np.isfinite(lo.astype(float))):
        raise ValueError("DGS requires finite supports (got unbounded)")
    K = int((hi - lo).max()) + 1
    grid = lo[:, None] + np.arange(K)[None, :]
    mask = grid <= hi[:, None]
    return DGSTune(support=jnp.asarray(grid, jnp.float64
                                       if jax.config.jax_enable_x64 else jnp.float32),
                   mask=jnp.asarray(mask))


def dgs_step(key, x, tune: DGSTune, logf):
    """One Gibbs sweep: for each element draw from its exact conditional
    over the enumerated support."""
    x = jnp.asarray(x)
    dt = x.dtype
    n = x.shape[0]
    keys = jax.random.split(key, n)

    def elem(i, x):
        cands = tune.support[i].astype(dt)

        def cand_logf(v):
            return logf(x.at[i].set(v))

        logmass = jax.vmap(cand_logf)(cands)
        logmass = jnp.where(tune.mask[i], logmass, -jnp.inf)
        # all -inf -> uniform over valid support (reference dgs.jl:118-122)
        degenerate = jnp.max(logmass) == -jnp.inf
        logits = jnp.where(degenerate,
                           jnp.where(tune.mask[i], 0.0, -jnp.inf), logmass)
        g = jax.random.gumbel(keys[i], logits.shape, logits.dtype)
        pick = jnp.argmax(logits + g)
        return x.at[i].set(cands[pick])

    return jax.lax.fori_loop(0, n, elem, x), tune


def discrete_step(key, support, mass):
    """Stand-alone DiscreteVariate form (reference sample!, dgs.jl:129-133):
    draw from explicit masses over a support grid; ``support`` (K,) or
    (K, d) rows, ``mass`` (K,)."""
    support = jnp.asarray(support)
    idx = jax.random.categorical(key, jnp.log(jnp.asarray(mass)))
    return support[idx]


class DGS(SamplerSpec):
    """DGS(params) — exact discrete Gibbs over model nodes with finite
    support (reference DGS ctor, dgs.jl:56-84).  Support bounds are frozen
    at model-compile time."""

    transform = False

    def build(self, cm):
        from .base import BlockKernel

        kernels = []
        for name in self.params:
            dist = cm.example_dists[name]
            if not getattr(dist, "is_discrete", False):
                raise ValueError(f"DGS needs a discrete node, got {name!r}")
            tune0 = dgs_support(dist, cm.sites[name].shape)
            pack, unpack, spec, logf = cm.block_functions((name,), False)
            kernels.append((name, tune0, pack, unpack, logf))

        def init(key, state):
            return tuple(t for _, t, _, _, _ in kernels)

        def step(key, state, tunes, adapt):
            for (name, _, pack, unpack, logf), tune in zip(kernels, tunes):
                key, sub = jax.random.split(key)
                x = pack(state)
                x2, _ = dgs_step(sub, x, tune, lambda v: logf(v, state))
                state = {**state, **unpack(x2, state)}
            return state, tunes

        return BlockKernel(init, step)
