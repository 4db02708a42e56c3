"""TPU-friendly random-variate kernels.

``jax.random.gamma`` lowers to a rejection loop under ``lax.while_loop``;
under vmap every lane spins until the slowest lane accepts, and on the
experimental tunneled-TPU runtime the scan->while composition inside the
engine's Gibbs programs has proven fragile (worker kernel faults, r4).
``gamma_bounded`` is the lockstep alternative: Marsaglia-Tsang (2000)
squeeze sampling with a FIXED number of proposal rounds and select-based
acceptance — straight-line code, no data-dependent control flow.

For shape a >= 1 one M-T proposal accepts with probability > 0.95 (> 0.996
for a >= 4), so ``rounds=8`` leaves a miss probability below 1e-10; a miss
falls back to the distribution mode a-1 (statistically invisible at that
probability, and finite — never a NaN).  Shapes a < 1 use the standard
boost ``Gamma(a) = Gamma(a+1) * U^(1/a)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gamma_bounded(key, a, shape=(), dtype=None, rounds: int = 8):
    """Draw Gamma(a, 1) variates with a fixed ``rounds``-proposal
    Marsaglia-Tsang sampler (no while_loop; see module docstring).

    Shape contract — NOT ``jax.random.gamma``'s: the result has shape
    ``tuple(shape) + a.shape`` (one draw per element of ``a``, replicated
    over the leading ``shape`` dims).  ``jax.random.gamma`` instead
    requires ``shape`` to already end with a broadcastable ``a.shape`` and
    returns exactly ``shape``; a drop-in swap with vector ``a`` and
    non-empty ``shape`` would differ — call with ``shape=()`` (the only
    form the engine uses) for identical semantics.
    """
    a = jnp.asarray(a)
    dtype = dtype or (a.dtype if jnp.issubdtype(a.dtype, jnp.floating)
                      else jnp.result_type(float))
    a = a.astype(dtype)
    out_shape = tuple(shape) + a.shape
    kb, kn, ku = jax.random.split(key, 3)

    # boost for a < 1: sample Gamma(a+1), multiply by U^(1/a)
    small = a < 1.0
    ab = jnp.where(small, a + 1.0, a)

    d = ab - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    x = jax.random.normal(kn, (rounds,) + out_shape, dtype)
    u = jax.random.uniform(ku, (rounds,) + out_shape, dtype)
    v = (1.0 + c * x) ** 3
    # squeeze + full test (Marsaglia & Tsang 2000, eq. 2.3); v<=0 rejects
    accept = (v > 0.0) & (jnp.log(u) < 0.5 * x * x + d - d * v
                          + d * jnp.log(jnp.where(v > 0.0, v, 1.0)))
    # first accepted round per lane (argmax of bool picks first True)
    idx = jnp.argmax(accept, axis=0)
    any_acc = jnp.any(accept, axis=0)
    vsel = jnp.take_along_axis(v, idx[None], axis=0)[0]
    g = d * jnp.where(any_acc, vsel, 1.0)   # fallback: mode (v=1 -> g=d)

    boost = jnp.exp(jnp.log(jax.random.uniform(
        kb, out_shape, dtype, minval=jnp.finfo(dtype).tiny)) / a)
    return jnp.where(small, g * boost, g)


def inverse_gamma_bounded(key, a, b, shape=(), dtype=None, rounds: int = 8):
    """InverseGamma(a, b) draw via ``gamma_bounded`` — the conjugate-Gibbs
    building block (s2 | rest in Normal hierarchies)."""
    g = gamma_bounded(key, a, shape=shape, dtype=dtype, rounds=rounds)
    return jnp.asarray(b, g.dtype) / g
