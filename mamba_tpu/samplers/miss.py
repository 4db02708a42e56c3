"""Missing-value imputation sampler (reference src/samplers/miss.jl).

NaN entries of an observed node's init values mark missingness.  The
reference scans for NaNs at iteration 1 (miss.jl:44-52); here the mask is
resolved statically at build time from the compiled model's example values
and every step redraws exactly those entries from the node's current
predictive distribution — one vectorized masked draw instead of the
reference's per-index loops (miss.jl:70-86).

The engine's chain initializer also consults these masks (via
``missing_masks``) so NaN inits are prior-imputed before the first
iteration — the reference gets the same effect because MISS runs inside
iteration 1 before any likelihood-consuming block touches the node.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerSpec


def missing_masks(cm, params) -> dict[str, np.ndarray]:
    """Static NaN masks of the given observed sites (empty-mask sites are
    dropped, mirroring miss.jl:47-49)."""
    masks = {}
    for name in params:
        v = cm.example_values[name]
        m = np.isnan(v)
        if m.any():
            masks[name] = m
    return masks


class MISS(SamplerSpec):
    """MISS(params) — imputation block for observed nodes with NaN entries
    (reference MISS ctor, miss.jl:41-62)."""

    transform = False

    def build(self, cm):
        from .base import BlockKernel

        masks = {n: jnp.asarray(m) for n, m in missing_masks(cm, self.params).items()}

        def init(key, state):
            return ()

        def step(key, state, tune, adapt):
            for name, mask in masks.items():
                key, sub = jax.random.split(key)
                dist = cm.node_dist(name, state)
                draw = jnp.broadcast_to(
                    jnp.asarray(dist.sample(sub), cm.dtype),
                    cm.sites[name].shape)
                state = {**state,
                         name: jnp.where(mask, draw, state[name])}
            return state, tune

        return BlockKernel(init, step)
