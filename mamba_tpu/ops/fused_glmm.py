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

Layout: dense-flat — per (chain-block, group-chunk) grid cell every array
is (Cb, n*Gc) with the n observation rows concatenated along the 128-wide
lane axis, so each elementwise pass runs at 100% (8, 128)-tile utilization
across all Cb chains at once; lp/gbeta accumulate across group chunks in
VMEM (matmul-style grid accumulation) and gbeta's contraction runs at
exact f32 on the VPU (P mul+reduce passes; the r4 MXU-bf16 contraction's
absolute noise swamped the cancelling near-mode gradient — see the
in-kernel comment).  Pad lanes are zero-filled rather than masked (their
exact -log 2 log-density bias is corrected statically).  Measured at the
stretch config (1024 chains x 10 obs x 10k groups, v5e): 1.34 ms/call vs
2.40 ms for the r02 chain-unrolled layout and 3.38 ms for plain XLA — see
KERNEL_LAB.json.

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


def _kernel(n: int, Gc: int, Xt_ref, y_ref, beta_ref, b_ref,
            lp_ref, gbeta_ref, gb_ref):
    """One (chain-block, group-chunk) grid cell in the dense-flat layout.

    Every array is (Cb, Nc) with Nc = n*Gc — the n observation rows of
    this group chunk are concatenated along the LANE axis, so every
    elementwise pass runs at 100% (8, 128)-tile utilization and covers all
    Cb chains at once.  (The r02 kernel kept (n=10, Gc) 2-D tiles — 37.5%
    sublane-pad waste — and unrolled chains into Cb separate narrow
    passes: measured 2.40 ms vs 0.99 ms for the same math at the stretch
    config.)  lp and gbeta accumulate across the group-chunk grid axis j
    in their VMEM-resident output blocks, matmul-style.

    Pad lanes carry ZEROED Xt/y/b (caller contract), so they need no mask:
    each contributes exactly ``-log 2`` to lp (corrected statically by the
    caller) and exactly zero to both gradients (r = 0.5 there, but its
    gbeta contribution multiplies the zeroed Xt, and pad lanes of gb are
    sliced off).  Dropping the in-kernel mask removed 4 of ~17 VPU passes.
    """
    j = pl.program_id(1)
    P = Xt_ref.shape[1]
    b = b_ref[:]
    y = y_ref[0]
    Xf = Xt_ref[0]                                # (P, Nc)
    l = jnp.concatenate([b] * n, axis=1)          # b[c, g] at every (i, g)
    for p in range(P):
        l = l + beta_ref[:, p:p + 1] * Xf[p:p + 1, :]
    # log Bernoulli(sigmoid(l)) = y*l - softplus(l), sharing ONE
    # exponential between softplus and sigmoid:
    #   e = exp(-|l|); softplus(l) = max(l,0) + log1p(e)
    #   sigmoid(l) = q = 1/(1+e) if l>=0 else 1-q
    e = jnp.exp(-jnp.abs(l))
    softplus = jnp.maximum(l, 0.0) + jnp.log1p(e)
    q = 1.0 / (1.0 + e)
    sig = jnp.where(l >= 0, q, 1.0 - q)
    term = y * l - softplus
    lp_c = jnp.sum(term, axis=1, keepdims=True)
    r = y - sig                                   # d lp / d l
    gb = r[:, :Gc]
    for i in range(1, n):
        gb = gb + r[:, i * Gc:(i + 1) * Gc]
    gb_ref[:] = gb
    # gbeta contraction at exact f32 on the VPU: P mul+reduce passes.
    # The r4 shipped kernel did this on the MXU at its native bf16-product
    # precision, which carries an absolute error ~2^-8 * sum|r*X| — near a
    # posterior mode the signed sum cancels ~100x below that scale, so the
    # gradient was ~11% off at real post-warmup states (BENCH_r04
    # grad_match:false; the r4 "0.002 vs f32" lab figure probed dispersed
    # states whose huge gradients hid the same absolute noise — and its
    # "f32 reference" was itself a default-precision bf16 MXU einsum).
    # Measured r5 A/B at the stretch config: VPU f32 1238 us vs MXU-bf16
    # 1069 us vs MXU f32 (Precision.HIGHEST, 6 passes) 1548 us — the +16%
    # buys an exactly-f32 gradient and stays 2.4x under the generic path.
    cols = [jnp.sum(r * Xf[p:p + 1, :], axis=1, keepdims=True)
            for p in range(P)]
    gbeta_c = jnp.concatenate(cols, axis=1)

    @pl.when(j == 0)
    def _init():
        lp_ref[:] = lp_c
        gbeta_ref[:] = gbeta_c

    @pl.when(j > 0)
    def _acc():
        lp_ref[:] = lp_ref[:] + lp_c
        gbeta_ref[:] = gbeta_ref[:] + gbeta_c


#: chains per grid step (first grid axis).  Swept at the stretch config
#: (C=1024, G=10k): 8 -> 1.63 ms, 64 -> 1.03 ms, 128 -> 0.99 ms; VMEM per
#: temp at (128, n*512) f32 is 2.6 MB, safely under the 16 MB budget
#: because block sizes no longer grow with G.  Shrunk automatically for
#: small batches (``_pick_cb``).
CHAIN_BLOCK = 128

#: group lanes per grid step (second grid axis).  The kernel streams
#: (P+2)*n*Gc*4-byte chunks of Xt/y per step; 512 lanes keeps ~6 live
#: (Cb, n*Gc) temporaries inside VMEM at Cb=128 and measured flat
#: 128..1024 (0.93-1.05 ms), so the conservative end wins.
G_LANE_BLOCK = 512


def _pick_cb(C: int) -> int:
    """Largest sublane-aligned chain block <= CHAIN_BLOCK covering C."""
    return CHAIN_BLOCK if C >= CHAIN_BLOCK else -(-C // 8) * 8


@functools.partial(jax.jit, static_argnames=("G", "chain_block", "g_lanes"))
def _fused_call_batched(Xt, y, betas, bs, *, G: int,
                        chain_block: int | None = None,
                        g_lanes: int | None = None):
    """betas: (C, P), bs: (C, Gp) with C a multiple of the chain block.

    ONE pallas_call over a (chain-blocks, group-chunks) grid; lp/gbeta
    accumulate across the chunk axis in VMEM.  Contract: lanes >= G of
    Xt, y and bs are ZERO (jnp.pad guarantees this for all callers here);
    the pad lanes' -log(2) log-density bias is corrected statically below.
    """
    Cb = _pick_cb(bs.shape[0]) if chain_block is None else chain_block
    Gc = G_LANE_BLOCK if g_lanes is None else g_lanes
    P, n, Gp = Xt.shape
    C = bs.shape[0]
    dt = bs.dtype
    pad = (-Gp) % Gc
    if pad:
        Xt = jnp.pad(Xt, ((0, 0), (0, 0), (0, pad)))
        y = jnp.pad(y, ((0, 0), (0, pad)))
        bs = jnp.pad(bs, ((0, 0), (0, pad)))
    Gpp = Gp + pad
    nch = Gpp // Gc
    # group-chunk-major relayout (one cheap XLA transpose of the small
    # constant arrays) so each grid step's (P, n*Gc) slice is contiguous
    Xtc = Xt.reshape(P, n, nch, Gc).transpose(2, 0, 1, 3).reshape(
        nch, P, n * Gc)
    yc = y.reshape(n, nch, Gc).transpose(1, 0, 2).reshape(nch, 1, n * Gc)
    lp, gbeta, gb = pl.pallas_call(
        functools.partial(_kernel, n, Gc),
        grid=(C // Cb, nch),
        out_shape=(
            jax.ShapeDtypeStruct((C, 1), dt),
            jax.ShapeDtypeStruct((C, P), dt),
            jax.ShapeDtypeStruct((C, Gpp), dt),
        ),
        in_specs=[
            pl.BlockSpec((1, P, n * Gc), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n * Gc), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cb, P), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cb, Gc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Cb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cb, P), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cb, Gc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(Xtc, yc, betas, bs)
    # zeroed pad lanes contribute exactly -log(2) each to lp
    lp = lp[:, 0] + jnp.asarray(n * (Gpp - G) * np.log(2.0), dt)
    return lp, gbeta, gb[:, :Gp]


def _fused_call(Xt, y, beta, b, *, G: int):
    cb = _pick_cb(1)
    lp, gbeta, gb = _fused_call_batched(
        Xt, y,
        jnp.pad(beta[None], ((0, cb - 1), (0, 0))),
        jnp.pad(b[None], ((0, cb - 1), (0, 0))), G=G)
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
    cb = _pick_cb(C)
    Cp = -(-C // cb) * cb
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
