"""Approximate Bayesian computation MH sampler.

TPU-native counterpart of reference src/samplers/abc.jl: summary-statistic
matching with kernel-weighted tolerances, ``nsim`` replicate simulations,
monotone tolerance decay, optional randomized tolerances, and a ``maxdraw``
rejection loop.  The reference re-walks the graph to forward-simulate data
nodes per draw (abc.jl:55-68); here the generative path is the compiled
model's ``forward_sample`` and the whole draw loop (including the nsim
simulations) is traced into the one engine program — the ``maxdraw`` retry
loop becomes a ``fori_loop`` with an accepted flag (first acceptance wins,
matching the reference's ``break``).

Proposals are made in the block's link-transformed space, like the
reference (unlist/relist with transform=true, abc.jl:45, 103-110).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerSpec


class ABCTune(NamedTuple):
    Tsim: jax.Array          # (nsim, Tdim) summaries under current params
    epsilon: jax.Array       # (nsim,) tolerances
    epsilonprime: jax.Array  # (nsim,) randomized tolerances


def _default_dist(Tsim, Tobs):
    return jnp.sqrt(jnp.sum((Tsim - Tobs) ** 2))


def _kernel_logpdf(kind: str, eps, d):
    """log kernel(0, eps).pdf(d) for the tolerance kernels the reference
    admits (SymDistributionType, extensions.jl:51-55)."""
    if kind == "uniform":      # SymUniform(0, eps) ~ Uniform(-eps, eps)
        return jnp.where(jnp.abs(d) <= eps, -jnp.log(2.0 * eps), -jnp.inf)
    if kind == "normal":
        return -0.5 * (d / eps) ** 2 - jnp.log(eps) - 0.5 * jnp.log(2 * jnp.pi)
    if kind == "epanechnikov":
        u = d / eps
        return jnp.where(jnp.abs(u) <= 1,
                         jnp.log(0.75 * (1 - u ** 2) / eps), -jnp.inf)
    raise ValueError(f"unsupported kernel {kind!r}")


class ABC(SamplerSpec):
    """ABC(params, scale, summary, epsilon; kernel='uniform',
    dist=euclidean, proposal='normal', maxdraw=1, nsim=1, decay=1.0,
    randeps=False) — reference ABC ctor (abc.jl:23-147).

    ``summary`` maps one data-node value array to summary statistics (the
    reference passes the unlisted vector; here the raw node array).
    """

    transform = True

    def __init__(self, params, scale, summary: Callable, epsilon: float,
                 kernel: str = "uniform", dist: Callable = _default_dist,
                 proposal: str = "normal", maxdraw: int = 1, nsim: int = 1,
                 decay: float = 1.0, randeps: bool = False):
        super().__init__(params)
        if not 0 <= decay <= 1:
            raise ValueError("decay is not in [0, 1]")
        self.scale = scale
        self.summary = summary
        self.epsilon = float(epsilon)
        self.kernel = kernel
        self.dist = dist
        self.proposal = proposal
        self.maxdraw = int(maxdraw)
        self.nsim = int(nsim)
        self.decay = float(decay)
        self.randeps = bool(randeps)

    # -- engine wiring ---------------------------------------------------
    def build(self, cm):
        from .base import BlockKernel

        pack, unpack, spec, logf_prior = cm.block_functions(
            self.params, True, prior_only=True)
        # data nodes: stochastic targets of the block, minus the block
        targets = cm.model.keys("target", list(self.params))
        stoch = set(cm.stochastic)
        datakeys = [t for t in targets if t in stoch and t not in self.params]
        if not datakeys:
            raise ValueError("ABC block has no stochastic data targets")
        dt = cm.dtype
        scale = jnp.asarray(self.scale, dt)
        eps_target = jnp.asarray(self.epsilon, dt)
        decay = self.decay
        nsim = self.nsim

        def summarize_values(state):
            parts = [jnp.ravel(jnp.asarray(self.summary(state[k]), dt))
                     for k in datakeys]
            return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        def simulate(key, state):
            sim = cm.forward_sample(key, state, names=datakeys)
            return summarize_values(sim)

        def sim_batch(key, state):
            keys = jax.random.split(key, nsim)
            return jax.vmap(lambda k: simulate(k, state))(keys)

        def distances(Tsim, Tobs):
            return jax.vmap(lambda t: self.dist(t, Tobs))(Tsim)

        def pi_epsilon(epsp, eps, d):
            logk = _kernel_logpdf(self.kernel, epsp, d)
            if self.randeps:
                log_err = -epsp / eps - jnp.log(eps)   # Exponential(eps) pdf
                return jnp.sum(jnp.exp(logk + log_err))
            return jnp.sum(jnp.exp(logk))

        def draw_epsprime(key, eps):
            if self.randeps:
                return eps * jax.random.exponential(key, eps.shape, dt)
            return eps

        def init(key, state):
            Tobs = summarize_values(state)
            Tsim = sim_batch(key, state)
            d = distances(Tsim, Tobs)
            eps = (jnp.maximum(eps_target, d) if decay > 0
                   else jnp.full((nsim,), eps_target, dt))
            key2 = jax.random.fold_in(key, 1)
            epsp = draw_epsprime(key2, eps)
            return ABCTune(Tsim=Tsim, epsilon=eps, epsilonprime=epsp)

        def noise(key, shape):
            if self.proposal == "normal":
                return jax.random.normal(key, shape, dt)
            if self.proposal == "uniform":
                return jax.random.uniform(key, shape, dt, -1.0, 1.0)
            raise ValueError(f"unsupported proposal {self.proposal!r}")

        def step(key, state, tune: ABCTune, adapt):
            theta0 = pack(state)
            logprior0 = logf_prior(theta0, state)
            Tobs = summarize_values(state)
            d0 = distances(tune.Tsim, Tobs)
            pi0 = pi_epsilon(tune.epsilonprime, tune.epsilon, d0)

            def body(i, carry):
                done, key, theta, Tsim, eps, epsp = carry
                key, kp, ks, ke, ka = jax.random.split(key, 5)
                theta1 = theta0 + scale * noise(kp, theta0.shape)
                logprior1 = logf_prior(theta1, state)
                state1 = {**state, **unpack(theta1, state)}
                Tsim1 = sim_batch(ks, state1)
                d1 = distances(Tsim1, Tobs)
                eps1 = ((1 - decay) * tune.epsilon
                        + decay * jnp.maximum(eps_target,
                                              jnp.minimum(d1, tune.epsilon)))
                epsp1 = draw_epsprime(ke, eps1)
                pi1 = pi_epsilon(epsp1, eps1, d1)

                ratio = pi1 / pi0 * jnp.exp(logprior1 - logprior0)
                acc = (~done) & jnp.isfinite(logprior1) & \
                    (jax.random.uniform(ka, (), dt) < ratio)
                theta = jnp.where(acc, theta1, theta)
                Tsim = jnp.where(acc, Tsim1, Tsim)
                eps = jnp.where(acc, eps1, eps)
                epsp = jnp.where(acc, epsp1, epsp)
                return done | acc, key, theta, Tsim, eps, epsp

            init_c = (jnp.asarray(False), key, theta0, tune.Tsim,
                      tune.epsilon, tune.epsilonprime)
            _, _, theta, Tsim, eps, epsp = jax.lax.fori_loop(
                0, self.maxdraw, body, init_c)
            state = {**state, **unpack(theta, state)}
            return state, ABCTune(Tsim=Tsim, epsilon=eps, epsilonprime=epsp)

        return BlockKernel(init, step)
