"""Sampler scaffolding: block kernels + stand-alone sampling API.

TPU-native counterpart of reference src/samplers/sampler.jl (Sampler,
SamplingBlock, SamplerVariate).  Two-level contract, mirroring the
reference's dual API (sampler.jl:31-47; doc/samplers/*.jl):

1. **Stand-alone kernels**: every sampler module exposes pure functions
   ``<name>_init(x0, ...) -> tune`` and ``<name>_step(key, x, tune, logf[,
   adapt]) -> (x', tune')`` operating on flat vectors with a user-supplied
   log-density — usable directly under jit/vmap/scan, no Model required.

2. **Engine specs**: ``SamplerSpec`` subclasses bind a kernel to a block of
   model nodes.  ``build(compiled_model)`` returns a ``BlockKernel`` whose
   ``step(key, state, tune, adapt) -> (state, tune)`` is pure and jittable;
   the engine composes the blocks into one Gibbs iteration under lax.scan.

Adaptation is a traced boolean (`model.iter <= burnin` in the reference,
e.g. nuts.jl:52) so the whole run compiles to a single XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class BlockKernel(NamedTuple):
    init: Callable   # (key, state) -> tune
    step: Callable   # (key, state, tune, adapt) -> (state, tune)


class SamplerSpec:
    """Base class for block sampler assignments (reference Sampler ctor,
    sampler.jl:20-24)."""

    #: operate on link-transformed (unconstrained) values?
    transform: bool = False
    #: does the kernel consume (logf, grad) rather than logf?
    needs_grad: bool = False

    def __init__(self, params):
        if isinstance(params, str):
            params = (params,)
        self.params = tuple(params)

    # -- subclass hooks --------------------------------------------------
    def kernel_init(self, key, x0, logf) -> object:
        raise NotImplementedError

    def kernel_step(self, key, x, tune, logf, adapt):
        raise NotImplementedError

    # -- engine wiring ---------------------------------------------------
    def build(self, cm) -> BlockKernel:
        pack, unpack, spec, logf = cm.block_functions(self.params, self.transform)

        if self.needs_grad:
            grad_fn = jax.value_and_grad(logf)

            def make_f(state):
                return lambda v: grad_fn(v, state)
        else:
            def make_f(state):
                return lambda v: logf(v, state)

        def init(key, state):
            return self.kernel_init(key, pack(state), make_f(state))

        def step(key, state, tune, adapt):
            x = pack(state)
            x2, tune2 = self.kernel_step(key, x, tune, make_f(state), adapt)
            return {**state, **unpack(x2, state)}, tune2

        return BlockKernel(init, step)

    def __repr__(self):
        return f"{type(self).__name__}({list(self.params)})"


def validate(x):
    """No-op validator — continuous-support kernels accept any vector
    (reference sampler.jl:72)."""
    return x


def _concrete(x):
    import numpy as np
    if isinstance(x, jax.core.Tracer):
        return None  # traced engine path: construction-time check impossible
    return np.asarray(x)


def validatebinary(x):
    """Require every element to be 0/1 (reference sampler.jl:75-79).
    Checked at stand-alone kernel construction on concrete inputs; traced
    values pass through (the reference validates only at SamplerVariate
    construction, which is likewise host-side)."""
    import numpy as np
    arr = _concrete(x)
    if arr is not None and not np.all((arr == 0) | (arr == 1)):
        raise ValueError("variate is not a binary vector")
    return x


def validatesimplex(x, atol: float = 1e-8):
    """Require a probability vector (reference sampler.jl:81-83)."""
    import numpy as np
    arr = _concrete(x)
    if arr is not None and not (np.all(arr >= -atol)
                                and abs(arr.sum() - 1.0) < 1e-6):
        raise ValueError("variate is not a probability vector")
    return x


def metropolis_accept(key, log_ratio, x_new, x_old):
    """Vector-state MH accept: returns x_new with prob exp(log_ratio)."""
    u = jax.random.uniform(key, (), jnp.asarray(log_ratio).dtype)
    accept = jnp.log(u) < log_ratio
    return jnp.where(accept, x_new, x_old), accept


def uturn(xminus, xplus, rminus, rplus):
    """No-U-turn termination criterion (reference nuts.jl:183-187) —
    returns True when the trajectory HAS turned."""
    xdiff = xplus - xminus
    return ~((jnp.dot(xdiff, rminus) >= 0) & (jnp.dot(xdiff, rplus) >= 0))
