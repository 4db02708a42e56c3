"""MAP estimation over model parameters.

TPU-native counterpart of the fork's experimental src/maxpost/maxpost.jl:
``optimOver(m, init, params)`` maximizes ``logpdf(m)`` with BFGS and
ForwardDiff dual numbers (maxpost.jl:40-50), plus hand-written Dual shims
for Normal (maxpost.jl:52-84).  Here the whole thing collapses to
``jax.value_and_grad`` of the compiled log-density — no shims needed — with
a choice of scipy-style BFGS or optax first-order optimizers, and optional
link-transformed (unconstrained) optimization so bounded parameters need no
box constraints.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..model.compile import CompiledModel, compile_model
from ..model.model import Model


@dataclasses.dataclass
class MAPResult:
    params: dict[str, Any]        # constrained MAP values per site
    logpdf: float                 # joint log-density at the optimum
    converged: bool
    niter: int

    def as_inits(self, data: dict) -> dict:
        """Merge with observed data for warm-starting ``mcmc`` (the fork's
        stated intent: MAP warm-start, SURVEY.md §2.6)."""
        out = dict(data)
        out.update({k: np.asarray(v) for k, v in self.params.items()})
        return out


def optim_over(model: Model, inputs: dict, inits: dict, params=None, *,
               method: str = "lbfgs", maxiter: int = 500, lr: float = 1e-2,
               dtype=None) -> MAPResult:
    """Maximize the joint log-density over ``params`` (default: every
    sampled/free stochastic node that is not observed data).

    ``method``: 'lbfgs' (optax, default — jax.scipy's BFGS line search is
    unreliable on heavy-tailed posteriors), 'adam', or 'bfgs'
    (jax.scipy.optimize)."""
    cm = compile_model(model, inputs, inits, dtype=dtype)
    if params is None:
        # default: sampled (free) nodes when a scheme is set, else everything
        observed = set(model.keys("observed")) if model.samplers else set()
        params = [n for n in cm.stochastic if n not in observed]
    params = tuple([params] if isinstance(params, str) else params)

    pack, unpack, spec, logf = cm.block_functions(params, transform=True)
    state0 = {n: jnp.asarray(np.asarray(inits[n], dtype=np.float64), cm.dtype)
              for n in cm.stochastic}
    state0 = {n: jnp.broadcast_to(v, cm.sites[n].shape)
              for n, v in state0.items()}
    x0 = pack(state0)

    def neg(x):
        return -logf(x, state0)

    if method == "bfgs":
        from jax.scipy.optimize import minimize
        res = minimize(neg, x0, method="BFGS",
                       options={"maxiter": maxiter})
        x, converged, nit = res.x, bool(res.success), int(res.nit)
    elif method in ("adam", "lbfgs"):
        import optax
        opt = optax.adam(lr) if method == "adam" else optax.lbfgs()
        grad_fn = jax.value_and_grad(neg)

        @jax.jit
        def run(x0):
            opt_state = opt.init(x0)

            def body(carry, _):
                x, opt_state = carry
                if method == "lbfgs":
                    value, grad = grad_fn(x)
                    updates, opt_state = opt.update(
                        grad, opt_state, x, value=value, grad=grad,
                        value_fn=neg)
                else:
                    _, grad = grad_fn(x)
                    updates, opt_state = opt.update(grad, opt_state, x)
                return (optax.apply_updates(x, updates), opt_state), None

            (x, _), _ = jax.lax.scan(body, (x0, opt_state), length=maxiter)
            return x

        x, converged, nit = run(x0), True, maxiter
    else:
        raise ValueError(f"unknown method {method!r}")

    values = unpack(x, state0)
    lp = float(cm.logpdf({**state0, **values}))
    return MAPResult(params={k: np.asarray(v) for k, v in values.items()},
                     logpdf=lp, converged=converged, niter=nit)
