"""Slice sampling, univariate (coordinate-wise) and multivariate shrinkage
forms (reference: src/samplers/slice.jl).

The unbounded shrinkage rejection loops become ``lax.while_loop``s with the
RNG key threaded through the carry — jit/vmap-safe; under vmap, lanes that
finish early idle until the batch converges (equivalent statistics).
By default operates on *constrained* values with -inf support masking, like
the reference (Slice(…, transform=false), slice.jl:50).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.backend import unroll_loops
from .base import SamplerSpec

#: hard cap on shrinkage-rejection trips.  Shrinkage halves the bracket
#: per rejection, so ~60 trips exhaust f64 resolution and any legitimate
#: step needs far fewer; the cap exists for DEGENERATE states (e.g. a
#: +inf/ridge density where no candidate can beat the slice level — the
#: kidney model's censored-time imputation transient reached a state
#: where one chain's shrinkage never terminated and froze the whole
#: vmapped program, r5 diagnosis).  At the cap the step returns the
#: shrunken candidate ~= x: a rejected move, exactly what an exact
#: sampler would effectively do from such a state.  (The reference's
#: loops are genuinely unbounded, slice.jl:66-117 — it would hang.)
MAX_SHRINK = 1000


class SliceTune(NamedTuple):
    width: jax.Array


def slice_init(x0, width) -> SliceTune:
    x0 = jnp.asarray(x0)
    return SliceTune(width=jnp.broadcast_to(jnp.asarray(width, x0.dtype), x0.shape))


def slice_univariate_step(key, x, tune: SliceTune, logf):
    """Coordinate-wise shrinkage slice sweep (reference slice.jl:66-92)."""
    n = x.shape[0]
    key, kl = jax.random.split(key)
    lower = x - tune.width * jax.random.uniform(kl, x.shape, x.dtype)
    upper = lower + tune.width

    def coord(i, carry):
        key, x, logf0, lower, upper = carry
        key, kp, kx = jax.random.split(key, 3)
        p0 = logf0 + jnp.log(jax.random.uniform(kp, (), x.dtype))
        xi_old = x[i]
        xi = lower[i] + (upper[i] - lower[i]) * jax.random.uniform(kx, (), x.dtype)
        x = x.at[i].set(xi)

        def cond(c):
            _, _, lf, _, _, it = c
            return (lf < p0) & (it < MAX_SHRINK)

        def body(c):
            key, x, _, lo, hi, it = c
            xi = x[i]
            lo = jnp.where(xi < xi_old, lo.at[i].set(xi), lo)
            hi = jnp.where(xi < xi_old, hi, hi.at[i].set(xi))
            key, kx = jax.random.split(key)
            xi_new = lo[i] + (hi[i] - lo[i]) * jax.random.uniform(kx, (), x.dtype)
            x = x.at[i].set(xi_new)
            return key, x, logf(x), lo, hi, it + 1

        key, x, logf0, lower, upper, it = jax.lax.while_loop(
            cond, body, (key, x, logf(x), lower, upper,
                         jnp.asarray(0, jnp.int32)))
        # cap reached = degenerate slice level (see MAX_SHRINK): reject
        # the coordinate move instead of keeping an unaccepted candidate
        hit = it >= MAX_SHRINK
        x = jnp.where(hit, x.at[i].set(xi_old), x)
        logf0 = jnp.where(hit, logf(x), logf0)
        return key, x, logf0, lower, upper

    carry = (key, x, logf(x), lower, upper)
    if n <= 16 and unroll_loops():
        # Trace-time unroll (TPU only — utils/backend.py).  A multi-trip
        # fori_loop whose body contains the shrinkage while_loop triggers a
        # pathological XLA/Mosaic compile blowup when composed after
        # another while_loop-heavy block in the same program (measured on
        # v5e: NUTS + fori(3 coords) > 590 s to compile vs 4 s unrolled;
        # each block alone ~3 s).  Unrolling n independent coordinate
        # updates costs linear program size — cheap for the small variance
        # blocks this form exists for.  On CPU under GSPMD the unroll is
        # the pathological shape instead (round-3 verdict), so the device
        # fori_loop is kept there.
        for i in range(n):
            carry = coord(i, carry)
    else:
        carry = jax.lax.fori_loop(0, n, coord, carry)
    _, x2, _, _, _ = carry
    return x2, None


def slice_multivariate_step(key, x, tune: SliceTune, logf):
    """Joint shrinkage slice step (reference slice.jl:95-117)."""
    key, kp, kl, kx = jax.random.split(key, 4)
    p0 = logf(x) + jnp.log(jax.random.uniform(kp, (), x.dtype))
    lower = x - tune.width * jax.random.uniform(kl, x.shape, x.dtype)
    upper = lower + tune.width
    y = lower + tune.width * jax.random.uniform(kx, x.shape, x.dtype)

    def cond(c):
        _, y, _, _, it = c
        return (logf(y) < p0) & (it < MAX_SHRINK)

    def body(c):
        key, y, lo, hi, it = c
        lo = jnp.where(y < x, y, lo)
        hi = jnp.where(y < x, hi, y)
        key, kx = jax.random.split(key)
        y = lo + (hi - lo) * jax.random.uniform(kx, y.shape, y.dtype)
        return key, y, lo, hi, it + 1

    _, y, _, _, it = jax.lax.while_loop(
        cond, body, (key, y, lower, upper, jnp.asarray(0, jnp.int32)))
    # cap reached = no acceptable candidate exists (degenerate level, see
    # MAX_SHRINK): reject the move instead of returning an unaccepted point
    y = jnp.where(it >= MAX_SHRINK, x, y)
    return y, None


class Slice(SamplerSpec):
    """Slice(params, width, form='multivariate'|'univariate',
    transform=False) — reference slice.jl:47-58."""

    def __init__(self, params, width, form: str = "multivariate",
                 transform: bool = False):
        super().__init__(params)
        if form not in ("univariate", "multivariate"):
            raise ValueError("form must be 'univariate' or 'multivariate'")
        self.width = width
        self.form = form
        self.transform = bool(transform)

    def kernel_init(self, key, x0, logf):
        return slice_init(x0, self.width)

    def kernel_step(self, key, x, tune, logf, adapt):
        if self.form == "univariate":
            x2, _ = slice_univariate_step(key, x, tune, logf)
        else:
            x2, _ = slice_multivariate_step(key, x, tune, logf)
        return x2, tune
