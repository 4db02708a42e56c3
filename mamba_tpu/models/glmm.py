"""Stretch config (BASELINE.json): large hierarchical logistic GLMM —
G groups x n observations, random intercepts, shared fixed effects.

    y[g,i] ~ Bernoulli( sigmoid( x[g,i,:] @ beta + b[g] ) )
    b[g]   ~ Normal(0, sqrt(s2))
    beta   ~ Normal(0, sqrt(10))
    s2     ~ InverseGamma(2, 2)

At G=10,000 the NUTS block is ~10k-dimensional — the scale regime the
reference cannot touch (its per-coordinate AMWG sweep would evaluate the
full likelihood 10k times per iteration; here one gradient evaluation is a
single fused (G, n, P) batched pass on the MXU/VPU).  Synthetic data with
known truth; ``build`` returns (model, inputs, inits, truth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model.model import Model
from ..model.nodes import Logical, Stochastic
from ..ops.distributions import Bernoulli, InverseGamma, Normal
from ..samplers import NUTS, Gibbs

P = 4


def build(G: int = 10_000, n: int = 10, seed: int = 0,
          mass_window: int = 100, fused: bool = False,
          centered: bool = False):
    """``fused=True`` swaps the observation node's generic
    Bernoulli(sigmoid(einsum)) likelihood for the fused Pallas kernel
    (ops/fused_glmm.py): one VMEM-resident pass computes the log-likelihood
    and both gradients, eliminating the HBM round-trip of the
    (chains, G, n) logit intermediates.  Observations then live as a
    lane-aligned (n, G) matrix.

    ``centered=False`` (default) uses the non-centered parameterization:
    z ~ N(0,1), b = sqrt(s2)*z (Logical), with s2 inside the gradient
    block (log-transformed).  This collapses the s2 <-> sum(b^2) funnel of
    the centered form — measured s2 autocorrelation tau ~7 vs ~18
    (centered + exact conjugate Gibbs) vs ~30 (centered + slice), which
    is what bounds the many-chain rank-R-hat gate (see models/rats.py).
    ``centered=True`` keeps b stochastic with a conjugate
    InverseGamma Gibbs draw of s2 — the classical scheme, kept for
    A/B coverage."""
    rng = np.random.default_rng(seed)
    beta_true = np.array([1.0, -0.5, 0.25, 0.0])
    s2_true = 0.5
    b_true = rng.normal(0, np.sqrt(s2_true), G)
    X = rng.normal(0, 1, (G, n, P))
    logits = X @ beta_true + b_true[:, None]
    Y = (rng.random((G, n)) < 1 / (1 + np.exp(-logits))).astype(float)

    if fused:
        from ..ops.fused_glmm import BernoulliLogitGLMM
        y_node = Stochastic(2, lambda xt, beta, b: BernoulliLogitGLMM(
            xt, beta, b), monitor=False)
        inputs = {"xt": np.ascontiguousarray(X.transpose(2, 1, 0))}
        y_init = np.ascontiguousarray(Y.T)           # (n, G), G on lanes
    else:
        # Precision.HIGHEST: the einsum's MXU contraction (and the
        # autodiff-derived backward contraction that produces d/dbeta)
        # defaults to bf16 products, whose ~2^-8 * sum|terms| absolute
        # noise dwarfs the near-mode beta gradient (the r4 grad-parity
        # mystery — see ops/fused_glmm.py).  The contraction is <1% of
        # this likelihood's FLOPs (the VPU softplus/sigmoid passes
        # dominate), so exact f32 here is essentially free.
        y_node = Stochastic(2, lambda x, beta, b: Bernoulli(
            jax.nn.sigmoid(jnp.einsum("gnp,p->gn", x, beta,
                                      precision=jax.lax.Precision.HIGHEST)
                           + b[:, None])),
            monitor=False)
        inputs = {"x": X}
        y_init = Y

    if centered:
        model = Model(
            y=y_node,
            b=Stochastic(1, lambda s2: Normal(jnp.zeros(G), jnp.sqrt(s2)),
                         monitor=False),
            beta=Stochastic(1, lambda: Normal(jnp.zeros(P), jnp.sqrt(10.0))),
            s2=Stochastic(lambda: InverseGamma(2.0, 2.0)),
        )

        # Exact conjugate draw of the random-effect variance (the
        # reference's user-supplied Gibbs-block pattern,
        # doc/tutorial/line.jl:27-45): s2 | b ~ IG(2 + G/2, 2 + sum(b^2)/2).
        # Bounded-rounds sampler, not jax.random.gamma (see models/rats.py).
        from ..ops.rng import inverse_gamma_bounded

        def s2_gibbs(key, env):
            b = env["b"]
            return {"s2": inverse_gamma_bounded(
                key, 2.0 + 0.5 * b.shape[0], 2.0 + 0.5 * jnp.sum(b * b))}

        model.set_samplers([
            NUTS(["beta", "b"], mass_window=mass_window),
            Gibbs("s2", s2_gibbs),
        ])
        inits = [{"y": y_init, "beta": np.zeros(P), "b": np.zeros(G),
                  "s2": 1.0}]
    else:
        model = Model(
            y=y_node,
            b=Logical(1, lambda s2, z: jnp.sqrt(s2) * z, monitor=False),
            z=Stochastic(1, lambda: Normal(jnp.zeros(G), 1.0),
                         monitor=False),
            beta=Stochastic(1, lambda: Normal(jnp.zeros(P), jnp.sqrt(10.0))),
            s2=Stochastic(lambda: InverseGamma(2.0, 2.0)),
        )
        model.set_samplers([
            NUTS(["beta", "z", "s2"], mass_window=mass_window),
        ])
        inits = [{"y": y_init, "beta": np.zeros(P), "z": np.zeros(G),
                  "s2": 1.0}]
    truth = {"beta": beta_true, "s2": s2_true, "b": b_true}
    return model, inputs, inits, truth
