"""User-defined sampler blocks.

TPU-native counterpart of the reference's user-supplied ``Sampler(params,
f)`` closures (sampler.jl:20-24), e.g. the closed-form Normal/InverseGamma
Gibbs updates in the tutorial (doc/tutorial/line.jl:27-45).  The user
function receives an RNG key and the full node environment (inputs +
stochastic values + logical values) and returns new values for the block's
params; it must be jit-compatible (pure JAX ops).
"""

from __future__ import annotations

from typing import Callable

import jax

from .base import BlockKernel, SamplerSpec


class Gibbs(SamplerSpec):
    """``Gibbs(params, fn)`` with ``fn(key, env) -> {param: new_value}``.

    ``env`` maps every node name (inputs, stochastics, logicals) to its
    current value, mirroring the reference's ``model[:node]`` accesses
    inside sampler closures."""

    transform = False

    def __init__(self, params, fn: Callable):
        super().__init__(params)
        self.fn = fn

    def build(self, cm) -> BlockKernel:
        pset = set(self.params)

        def init(key, state):
            return ()

        def step(key, state, tune, adapt):
            env = cm._eval_env(state)
            new = self.fn(key, env)
            extra = set(new) - pset
            if extra:
                raise ValueError(
                    f"Gibbs block for {self.params} returned values for "
                    f"non-block nodes {sorted(extra)}")
            return {**state, **{k: jax.numpy.asarray(v, cm.dtype)
                                for k, v in new.items()}}, tune

        return BlockKernel(init, step)
