"""Slice sampling within a simplex (reference src/samplers/slicesimplex.jl).

The rejection loop over shrinking simplexes becomes a ``lax.while_loop``
(SURVEY.md §7.4); the per-coordinate shrink pass (shrinksimplex,
slicesimplex.jl:109-122) is a masked ``fori_loop``.  Vertices are a (K, K)
matrix; the K x K solves ride the MXU under vmap over chains.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import SamplerSpec, validatesimplex


class SliceSimplexTune(NamedTuple):
    scale: jax.Array


def slicesimplex_init(x0, scale: float = 1.0) -> SliceSimplexTune:
    """Stand-alone tune constructor; validates the initial simplex point
    (reference SliceSimplexVariate validator, sampler.jl:81-83)."""
    if not 0.0 < scale <= 1.0:
        raise ValueError("scale is not in (0, 1]")
    x0 = jnp.asarray(validatesimplex(x0))
    return SliceSimplexTune(scale=jnp.asarray(scale, x0.dtype))


def _make_first_simplex(key, x, scale):
    """Initial bounding simplex around x (reference slicesimplex.jl:98-102)."""
    K = x.shape[0]
    V = jnp.eye(K, dtype=x.dtype)
    V = V.at[:, 1:].add((1.0 - scale) * (V[:, :1] - V[:, 1:]))
    w = jax.random.dirichlet(key, jnp.ones(K, x.dtype)).astype(x.dtype)
    return V + (x - V @ w)[:, None]


def _shrink(V, bx, bc, cc):
    """Shrink vertices toward the rejected point (reference
    slicesimplex.jl:109-122): for each coordinate with bc_i < bx_i, pull all
    other vertices toward vertex i and re-solve the barycentric coords."""
    K = V.shape[0]

    def coord(i, carry):
        V, bc = carry

        def do(carry):
            V, bc = carry
            cols = V + bc[i] * (V[:, i][:, None] - V)
            V = jnp.where(jnp.arange(K)[None, :] == i, V, cols)
            bc = jnp.linalg.solve(V, cc)
            return V, bc

        return jax.lax.cond(bc[i] < bx[i], do, lambda c: c, (V, bc))

    V, _ = jax.lax.fori_loop(0, K, coord, (V, bc))
    return V


def slicesimplex_step(key, x, tune: SliceSimplexTune, logf, max_iter: int = 1000):
    """One slice-simplex transition on a simplex-valued vector x
    (reference sample!, slicesimplex.jl:86-103)."""
    x = jnp.asarray(x)
    dt = x.dtype
    K = x.shape[0]
    key, kp, kv, kx = jax.random.split(key, 4)
    p0 = logf(x) + jnp.log(jax.random.uniform(kp, (), dt))

    V = _make_first_simplex(kv, x, tune.scale)
    vb = jnp.linalg.solve(V, x)
    xb = jax.random.dirichlet(kx, jnp.ones(K, dt)).astype(dt)
    xn = V @ xb

    def bad(xn):
        return (jnp.any(xn < 0.0) | jnp.any(xn > 1.0) | (logf(xn) < p0))

    def cond(c):
        _, _, _, xn, it = c
        return bad(xn) & (it < max_iter)

    def body(c):
        key, V, xb, xn, it = c
        vb = jnp.linalg.solve(V, x)
        V = _shrink(V, vb, xb, xn)
        key, kx = jax.random.split(key)
        xb = jax.random.dirichlet(kx, jnp.ones(K, dt)).astype(dt)
        return key, V, xb, V @ xb, it + 1

    _, _, _, xn, _ = jax.lax.while_loop(
        cond, body, (key, V, xb, xn, jnp.asarray(0)))
    return jnp.where(bad(xn), x, xn), tune


class SliceSimplex(SamplerSpec):
    """SliceSimplex(params; scale=1.0) — slice sampling for simplex-valued
    nodes, e.g. Dirichlet/Categorical-probability blocks (reference
    slicesimplex.jl:38-64).  Supports multiple simplex nodes per block;
    each is updated with its own shrinking-simplex pass."""

    transform = False

    def __init__(self, params, scale: float = 1.0):
        super().__init__(params)
        if not 0 < scale <= 1:
            raise ValueError("scale is not in (0, 1]")
        self.scale = float(scale)

    def build(self, cm):
        from .base import BlockKernel

        # a site of shape (..., K) is a batch of independent K-simplexes
        # (reference SliceSimplex_sub! over Array{MultivariateDistribution},
        # slicesimplex.jl:61-79): each row gets its own shrinking-simplex
        # pass, sequentially, against the block log-density.
        per_site = []
        for name in self.params:
            shape = cm.sites[name].shape
            K = shape[-1] if shape else 1
            R = 1
            for d in shape[:-1]:
                R *= d
            per_site.append((name, R, K) + cm.block_functions((name,), False))

        def init(key, state):
            dt = jnp.asarray(state[self.params[0]]).dtype
            return SliceSimplexTune(scale=jnp.asarray(self.scale, dt))

        def step(key, state, tune, adapt):
            for name, R, K, pack, unpack, spec, logf in per_site:
                x = pack(state).reshape(R, K)
                if R == 1:
                    key, sub = jax.random.split(key)
                    row, _ = slicesimplex_step(
                        sub, x[0], tune,
                        lambda v: logf(v.reshape(-1), state))
                    x = row.reshape(R, K)
                else:
                    # sequential Gibbs over row-simplexes as a lax.scan:
                    # the shrinking-simplex while_loop traces once, not R
                    # times (compile-time, not runtime, win)
                    def row_pass(carry, r, logf=logf):
                        key, x = carry
                        key, sub = jax.random.split(key)
                        row = jax.lax.dynamic_index_in_dim(x, r, 0, False)
                        new, _ = slicesimplex_step(
                            sub, row, tune,
                            lambda v: logf(
                                jax.lax.dynamic_update_index_in_dim(
                                    x, v, r, 0).reshape(-1), state))
                        return (key, jax.lax.dynamic_update_index_in_dim(
                            x, new, r, 0)), None

                    (key, x), _ = jax.lax.scan(
                        row_pass, (key, x), jnp.arange(R))
                state = {**state, **unpack(x.reshape(-1), state)}
            return state, tune

        return BlockKernel(init, step)
