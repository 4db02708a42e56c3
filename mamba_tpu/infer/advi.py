"""ADVI: automatic differentiation variational inference.

Mean-field Gaussian posterior over the model's free parameters in
link-transformed (unconstrained) space, fit by stochastic maximization of
the reparameterized ELBO (Kucukelbir et al. 2017) with optax Adam.  The
entropy term of a Gaussian is closed-form; the log-Jacobians of the support
transforms are already part of the compiled block density, so the ELBO is

    E_{z~q}[ logp(forward(z)) + log|J(z)| ] + H(q).

Everything — sampling, gradient, update — is one jitted ``lax.scan``; Monte
Carlo gradients use ``nmc`` draws per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..model.compile import compile_model
from ..model.model import Model


@dataclasses.dataclass
class ADVIResult:
    mu: jax.Array                 # variational mean (unconstrained space)
    log_sigma: jax.Array          # variational log-stddev
    elbo_trace: np.ndarray
    params: tuple[str, ...]
    _cm: Any
    _unpack: Any

    def sample(self, key, n: int = 1000) -> dict[str, jax.Array]:
        """Draws from q mapped to constrained space: {site: (n, ...)}."""
        z = self.mu + jnp.exp(self.log_sigma) * jax.random.normal(
            key, (n, self.mu.shape[0]), self.mu.dtype)
        state0 = self._state0
        return jax.jit(jax.vmap(lambda v: self._unpack(v, state0)))(z)

    def mean_state(self) -> dict[str, np.ndarray]:
        """Posterior-mean-ish point (q's mode) in constrained space — the
        MCMC warm-start payload."""
        vals = self._unpack(self.mu, self._state0)
        return {k: np.asarray(v) for k, v in vals.items()}

    def as_inits(self, data: dict) -> dict:
        out = dict(data)
        out.update(self.mean_state())
        return out

    def unconstrained_variances(self) -> dict[str, "np.ndarray"]:
        """q's per-coordinate variances split by site, in unconstrained
        (link-transformed) space — the natural warm-start for a NUTS
        diagonal inverse mass (``NUTS(..., minv0=...)``)."""
        parts = self._spec.unravel(jnp.exp(2.0 * self.log_sigma))
        return {k: np.asarray(v) for k, v in parts.items()}


def advi(model: Model, inputs: dict, inits: dict, params=None, *,
         steps: int = 2000, nmc: int = 8, lr: float = 5e-2, seed: int = 0,
         dtype=None) -> ADVIResult:
    """Fit a mean-field Gaussian to the free parameters' posterior."""
    cm = compile_model(model, inputs, inits, dtype=dtype)
    if params is None:
        observed = set(model.keys("observed")) if model.samplers else set()
        params = [n for n in cm.stochastic if n not in observed]
    params = tuple([params] if isinstance(params, str) else params)

    pack, unpack, spec, logf = cm.block_functions(params, transform=True)
    state0 = {n: jnp.broadcast_to(
        jnp.asarray(np.asarray(inits[n], dtype=np.float64), cm.dtype),
        cm.sites[n].shape) for n in cm.stochastic}
    mu0 = pack(state0)
    d = mu0.shape[0]
    log_sigma0 = jnp.full((d,), -2.0, cm.dtype)

    opt = optax.adam(lr)

    def elbo(vp, key):
        mu, log_sigma = vp
        eps = jax.random.normal(key, (nmc, d), cm.dtype)
        z = mu + jnp.exp(log_sigma) * eps
        logp = jax.vmap(lambda v: logf(v, state0))(z)
        entropy = jnp.sum(log_sigma) + 0.5 * d * (1 + jnp.log(2 * jnp.pi))
        return jnp.mean(logp) + entropy

    @jax.jit
    def run(mu, log_sigma, key):
        vp = (mu, log_sigma)
        opt_state = opt.init(vp)

        def body(carry, _):
            vp, opt_state, key = carry
            key, sub = jax.random.split(key)
            val, grads = jax.value_and_grad(lambda p: -elbo(p, sub))(vp)
            updates, opt_state = opt.update(grads, opt_state, vp)
            vp = optax.apply_updates(vp, updates)
            return (vp, opt_state, key), -val

        (vp, _, _), trace = jax.lax.scan(
            body, (vp, opt_state, key), length=steps)
        return vp, trace

    (mu, log_sigma), trace = run(mu0, log_sigma0, jax.random.key(seed))
    res = ADVIResult(mu=mu, log_sigma=log_sigma,
                     elbo_trace=np.asarray(trace), params=params,
                     _cm=cm, _unpack=unpack)
    res._state0 = state0
    res._spec = spec
    return res
