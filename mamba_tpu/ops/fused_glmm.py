"""Fused Pallas TPU kernel: hierarchical logistic-GLMM log-likelihood + grad.

The hot kernel of the GLMM stretch config (docs/perf.md) is
``value_and_grad`` of

    lp(beta, b) = sum_{i,g} [ y * l - softplus(l) ],
    l[i, g] = sum_p Xt[p, i, g] * beta[p] + b[g]

Plain XLA runs it at ~66% of the v5e HBM roofline because the
(chains, n, G) logit intermediates round-trip through HBM between the
forward and backward passes.  This kernel computes the scalar
log-likelihood AND both gradients in ONE pass with everything resident in
VMEM: per call it reads Xt (shared across chains) and (y, b) once, writes
(lp, grad_beta, grad_b) once, and never materializes logits off-chip.

Layout: the group axis G lives on the 128-wide lane dimension (Xt is
(P, n, G), y is (n, G)) so every op is a well-tiled VPU pass; G is padded
to a lane multiple and the pad lanes are masked in-kernel.

Exposed as ``bernoulli_logit_glmm_loglik(Xt, y, beta, b) -> scalar`` with a
``jax.custom_vjp`` whose forward already holds the gradients — NUTS's
``value_and_grad`` costs exactly one kernel launch.  Composes with ``vmap``
over chains (Pallas adds a grid axis; unmapped Xt/y are not copied).

This is an opt-in building block (``models.glmm.build(fused=True)``) — the
graph compiler's generic XLA path remains the default.  Falls back to the
Pallas interpreter off-TPU so the CPU test suite exercises the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distributions.base import Distribution, distribution
from . import bijectors as bij

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(G: int, Xt_ref, y_ref, beta_ref, b_ref,
            lp_ref, gbeta_ref, gb_ref):
    """One chain-block: Cb chains against the (VMEM-resident) Xt and y.
    Cb is the leading dim of beta/b/out refs; the P and Cb loops are tiny
    static unrolls — every array op is a full (n, Gp) VPU pass with the
    group axis on lanes."""
    P, n, Gp = Xt_ref.shape
    Cb = b_ref.shape[0]
    y = y_ref[:]
    mask = jax.lax.broadcasted_iota(jnp.int32, (n, Gp), 1) < G

    def body(c, carry):
        l = jnp.broadcast_to(b_ref[pl.ds(c, 1), :], (n, Gp))
        for p in range(P):
            l = l + beta_ref[c, p] * Xt_ref[p]
        # log Bernoulli(sigmoid(l)) = y*l - softplus(l), sharing ONE
        # exponential between softplus and sigmoid:
        #   e = exp(-|l|); softplus(l) = max(l,0) + log1p(e)
        #   sigmoid(l) = 1/(1+e) if l>=0 else e/(1+e)
        e = jnp.exp(-jnp.abs(l))
        softplus = jnp.maximum(l, 0.0) + jnp.log1p(e)
        recip = 1.0 / (1.0 + e)
        sig = jnp.where(l >= 0, recip, e * recip)
        term = y * l - softplus
        lp_ref[c, 0] = jnp.sum(jnp.where(mask, term, 0.0))
        r = jnp.where(mask, y - sig, 0.0)                 # d lp / d l
        gb_ref[pl.ds(c, 1), :] = jnp.sum(r, axis=0, keepdims=True)
        for p in range(P):
            gbeta_ref[c, p] = jnp.sum(r * Xt_ref[p])
        return carry

    # Python unroll: Cb independent chains' passes interleave (ILP).
    # A fori_loop would halve VMEM pressure but serializes the chains:
    # measured 6.8 ms vs 4.1 ms per 1024-chain grad at G=10k.
    for c in range(Cb):
        body(c, 0)


#: chains per grid step.  One chain per step makes the per-step overhead
#: and the Xt/y re-fetch dominate; 8 amortizes both and the unrolled
#: block sits just inside the 16 MB VMEM budget at G=10k.  (Callers whose
#: traces push VMEM over the cliff — seen once under ADVI's ELBO — should
#: use the generic likelihood for that phase instead.)
CHAIN_BLOCK = 8


#: max group-lanes per kernel call.  The unrolled chain block keeps
#: ~7 live (n, G_chunk) temporaries per chain; 4096 lanes x 8 chains
#: ~ 10 MB, safely inside the 16 MB VMEM budget (a full 10k-group call
#: sat at 17-18 MB — over the cliff on some traces).
MAX_G_LANES = 4096


@functools.partial(jax.jit, static_argnames=("G",))
def _fused_call_batched(Xt, y, betas, bs, *, G: int):
    """betas: (C, P), bs: (C, Gp) with C a multiple of CHAIN_BLOCK.
    Large group axes are processed in MAX_G_LANES chunks (one kernel call
    each; partial results reduce outside)."""
    P, n, Gp = Xt.shape
    if Gp > MAX_G_LANES:
        lp_t, gbeta_t, gbs = 0.0, 0.0, []
        for off in range(0, Gp, MAX_G_LANES):
            end = min(off + MAX_G_LANES, Gp)
            Gc = max(0, min(G - off, end - off))
            lp, gbeta, gb = _fused_call_batched(
                Xt[:, :, off:end], y[:, off:end], betas, bs[:, off:end],
                G=Gc)
            lp_t, gbeta_t = lp_t + lp, gbeta_t + gbeta
            gbs.append(gb)
        return lp_t, gbeta_t, jnp.concatenate(gbs, axis=1)
    C = bs.shape[0]
    Cb = CHAIN_BLOCK
    dt = bs.dtype
    full = lambda *_idx: (0, 0)          # Xt/y: same block every step
    full3 = lambda *_idx: (0, 0, 0)
    blk = lambda i: (i, 0)               # chain-block row i
    lp, gbeta, gb = pl.pallas_call(
        functools.partial(_kernel, G),
        grid=(C // Cb,),
        out_shape=(
            jax.ShapeDtypeStruct((C, 1), dt),
            jax.ShapeDtypeStruct((C, P), dt),
            jax.ShapeDtypeStruct((C, Gp), dt),
        ),
        in_specs=[
            pl.BlockSpec((P, n, Gp), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, Gp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((Cb, P), blk, memory_space=pltpu.SMEM),
            pl.BlockSpec((Cb, Gp), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Cb, 1), blk, memory_space=pltpu.SMEM),
            pl.BlockSpec((Cb, P), blk, memory_space=pltpu.SMEM),
            pl.BlockSpec((Cb, Gp), blk, memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(Xt, y, betas, bs)
    return lp[:, 0], gbeta, gb


def _fused_call(Xt, y, beta, b, *, G: int):
    lp, gbeta, gb = _fused_call_batched(
        Xt, y,
        jnp.pad(beta[None], ((0, CHAIN_BLOCK - 1), (0, 0))),
        jnp.pad(b[None], ((0, CHAIN_BLOCK - 1), (0, 0))), G=G)
    return lp[0], gbeta[0], gb[0]


def _pad_lanes(a, axis):
    size = a.shape[axis]
    pad = (-size) % LANES
    if not pad:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@jax.custom_vjp
def bernoulli_logit_glmm_loglik(Xt, y, beta, b):
    """sum_{i,g} log Bernoulli(y[i,g] | sigmoid(Xt[:,i,g]·beta + b[g])).

    Xt: (P, n, G) covariates, y: (n, G) in {0,1}, beta: (P,), b: (G,).
    One fused VMEM-resident pass; gradients for beta and b come free via
    the custom VJP.

    **Contract: Xt and y must be constants (data).**  The custom VJP
    returns zero cotangents for them, so if Xt or y were computed from
    sampled parameters (e.g. through a logical node) their gradient would
    silently vanish and the posterior would be wrong.  Likewise ``vmap``
    over chains shares ONE y across the batch (the engine chain-stacks
    observed data with identical rows); per-chain differing observations —
    MISS imputation over this node, or a user vmapping over datasets — are
    unsupported and rejected by the engine (``supports_imputation=False``).
    Use the generic ``Bernoulli(sigmoid(...))`` likelihood for those."""
    lp, _, _ = _fwd_parts(Xt, y, beta, b)
    return lp


@jax.custom_batching.custom_vmap
def _fwd_parts(Xt, y, beta, b):
    G = b.shape[0]
    lp, gbeta, gb = _fused_call(_pad_lanes(Xt, 2), _pad_lanes(y, 1),
                                beta, _pad_lanes(b, 0), G=G)
    return lp, gbeta, gb[:G]


@_fwd_parts.def_vmap
def _fwd_parts_vmap_rule(axis_size, in_batched, Xt, y, beta, b):
    """vmap over chains lowers to the chain-blocked kernel (CHAIN_BLOCK
    chains per grid step) instead of Pallas's default one-call-per-batch-
    element grid, which re-fetches Xt/y per chain and is per-step-overhead
    bound (measured 8.2 ms vs 5.0 ms plain XLA at 1024 chains on v5e)."""
    xt_b, y_b, beta_b, b_b = in_batched
    if xt_b:
        raise NotImplementedError(
            "fused GLMM kernel: covariates cannot be vmapped")
    if y_b:
        # the engine chain-stacks every stochastic site, including observed
        # data, so y arrives batched with identical rows; the kernel shares
        # one copy across the batch.  (Per-chain differing observations —
        # e.g. MISS imputation over this node — are unsupported here; use
        # the generic likelihood for that.)
        y = y[0]
    if not beta_b:
        beta = jnp.broadcast_to(beta[None], (axis_size,) + beta.shape)
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    C, G = b.shape
    Cp = -(-C // CHAIN_BLOCK) * CHAIN_BLOCK
    betas = jnp.pad(beta, ((0, Cp - C), (0, 0)))
    bs = _pad_lanes(jnp.pad(b, ((0, Cp - C), (0, 0))), 1)
    lp, gbeta, gb = _fused_call_batched(_pad_lanes(Xt, 2), _pad_lanes(y, 1),
                                        betas, bs, G=G)
    return (lp[:C], gbeta[:C], gb[:C, :G]), (True, True, True)


def _vjp_fwd(Xt, y, beta, b):
    lp, gbeta, gb = _fwd_parts(Xt, y, beta, b)
    return lp, (gbeta, gb, Xt, y)


def _vjp_bwd(res, ct):
    gbeta, gb, Xt, y = res
    # Xt and y are data constants: their zero cotangents are DCE'd by XLA
    return (jnp.zeros_like(Xt), jnp.zeros_like(y),
            ct * gbeta, ct * gb)


bernoulli_logit_glmm_loglik.defvjp(_vjp_fwd, _vjp_bwd)


def reference_loglik(Xt, y, beta, b):
    """Plain-XLA formula (the A/B baseline and the CPU-correctness oracle)."""
    l = jnp.einsum("pig,p->ig", Xt, beta) + b[None, :]
    return jnp.sum(y * l - jax.nn.softplus(l))


@distribution(static=())
class BernoulliLogitGLMM(Distribution):
    """Whole-array Bernoulli-logit GLMM likelihood as one distribution:
    the (n, G) observation matrix is a single event whose log_prob is the
    fused Pallas kernel.  Drop-in for a stochastic data node — the graph
    compiler's generic ``_site_lp`` path needs nothing special.

    Reference parity note: in Mamba.jl this model would be an
    ``Array{UnivariateDistribution}`` node evaluated element-by-element
    (distributionstruct.jl:142-168); here it is one kernel launch."""

    Xt: jax.Array     # (P, n, G)
    beta: jax.Array   # (P,)
    b: jax.Array      # (G,)

    event_ndim = 2
    is_discrete = True
    #: the fused kernel shares one y across the vmapped chain batch — MISS
    #: imputation (per-chain y values) would silently evaluate every chain
    #: against chain 0's data, so the engine rejects NaN inits on this node
    #: (model/mcmc.py _chain_inits).  Use fused=False for missing data.
    supports_imputation = False

    @property
    def batch_shape(self):
        return ()

    @property
    def event_shape(self):
        return self.Xt.shape[1:]

    def _logits(self):
        return (jnp.einsum("pig,p->ig", self.Xt, self.beta)
                + self.b[None, :])

    def log_prob(self, x):
        return bernoulli_logit_glmm_loglik(self.Xt, x, self.beta, self.b)

    def total_log_prob(self, x):
        # honor support like the generic Bernoulli does: non-binary y yields
        # -inf, not a silently-wrong density (the check is one cheap pass
        # over y — no Xt traffic — per call)
        return jnp.where(self.in_support(x), self.log_prob(x),
                         -jnp.inf)

    def in_support(self, x):
        return jnp.all((x == 0.0) | (x == 1.0))

    def sample(self, key, shape=()):
        p = jax.nn.sigmoid(self._logits())
        u = jax.random.uniform(key, shape + p.shape, p.dtype)
        return (u < p).astype(p.dtype)

    def bijector(self):
        return bij.Discrete()

    def mean(self):
        return jax.nn.sigmoid(self._logits())
