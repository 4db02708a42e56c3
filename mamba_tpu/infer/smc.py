"""Likelihood-tempered sequential Monte Carlo with systematic resampling.

A TPU-native inference backend the reference lacks (BASELINE.json north
star: "SMC with systematic resampling via jax.lax collectives").  Anatomy:

- particles live in the model's link-transformed space; the prior and the
  tempered likelihood come from the compiled block densities (prior_only
  variant + full density difference),
- adaptive temperature ladder: each step solves for the Δbeta whose
  effective sample size equals ``ess_target`` (bisection under
  ``lax.while_loop``),
- systematic resampling (one uniform, stratified positions) — a sorted
  gather that XLA turns into an all-gather when the particle axis is
  sharded over a mesh,
- MCMC rejuvenation: a few random-walk Metropolis steps per temperature,
  scaled by the weighted particle covariance diag.

Everything after compilation is one jitted ``lax.while_loop`` over
temperatures.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..model.compile import compile_model
from ..model.model import Model


@dataclasses.dataclass
class SMCResult:
    particles: dict[str, np.ndarray]   # constrained draws {site: (N, ...)}
    log_evidence: float                # log marginal-likelihood estimate
    n_stages: int
    ess_final: float
    params: tuple[str, ...]


def _systematic_resample(key, logw, n):
    """Systematic resampling indices (one uniform per generation)."""
    w = jax.nn.softmax(logw)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.searchsorted(cum, pts)


def smc(model: Model, inputs: dict, inits: dict, params=None, *,
        n_particles: int = 1024, ess_target: float = 0.5,
        rejuvenation_steps: int = 10, max_stages: int = 100, seed: int = 0,
        dtype=None, mesh=None, particle_axis: str = "chains") -> SMCResult:
    """Sample the posterior by tempering prior -> posterior.

    With ``mesh``, the particle axis is sharded over the mesh's
    ``particle_axis`` dimension (data-parallel particles; the resampling
    gather and the ESS psum become XLA collectives).

    ``rejuvenation_steps`` is the main quality knob: hierarchical posteriors
    with heavy-tailed priors (line/rats-style variance terms) need ~20-50
    RWM refresh steps per temperature for unbiased moments; the conjugate
    check in tests/test_infer.py is exact already at the default."""
    cm = compile_model(model, inputs, inits, dtype=dtype)
    if params is None:
        observed = set(model.keys("observed")) if model.samplers else set()
        params = [n for n in cm.stochastic if n not in observed]
    params = tuple([params] if isinstance(params, str) else params)

    pack, unpack, spec, log_post = cm.block_functions(params, transform=True)
    _, _, _, log_prior = cm.block_functions(params, transform=True,
                                            prior_only=True)
    state0 = {n: jnp.broadcast_to(
        jnp.asarray(np.asarray(inits[n], dtype=np.float64), cm.dtype),
        cm.sites[n].shape) for n in cm.stochastic}
    d = pack(state0).shape[0]
    N = n_particles
    dt = cm.dtype

    lprior = jax.vmap(lambda z: log_prior(z, state0))
    lpost = jax.vmap(lambda z: log_post(z, state0))

    def loglike(z):
        ll = lpost(z) - lprior(z)
        # heavy-tailed priors (e.g. InverseGamma(1e-3, 1e-3)) draw particles
        # where the likelihood underflows to -inf; keep it finite so the
        # Δbeta bisection's 0 * ll stays well-defined
        return jnp.where(jnp.isfinite(ll), ll, -1e30)

    def ess_frac(logw):
        w = jax.nn.softmax(logw)
        return 1.0 / (N * jnp.sum(w ** 2))

    def next_beta(beta, ll):
        """Largest Δbeta with ESS(Δbeta·ll) >= ess_target (bisection)."""
        def ess_at(db):
            return ess_frac(db * ll)

        def cond(c):
            lo, hi, it = c
            return (it < 50) & (hi - lo > 1e-6)

        def body(c):
            lo, hi, it = c
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= ess_target
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1

        full = jnp.minimum(1.0 - beta, 1.0)
        good_full = ess_at(full) >= ess_target
        lo, hi, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0.0, dt), full, jnp.asarray(0)))
        db = jnp.where(good_full, full, lo)
        return jnp.minimum(beta + db, 1.0)

    def rejuvenate(key, z, beta, scale):
        """RWM steps targeting prior + beta*likelihood."""
        def target(v):
            return log_prior(v, state0) + beta * (log_post(v, state0)
                                                  - log_prior(v, state0))

        def one_step(carry, _):
            key, z = carry
            key, kp, ka = jax.random.split(key, 3)
            prop = z + scale * jax.random.normal(kp, z.shape, dt)
            lp0 = jax.vmap(target)(z)
            lp1 = jax.vmap(target)(prop)
            u = jax.random.uniform(ka, (N,), dt)
            acc = jnp.log(u) < lp1 - lp0
            return (key, jnp.where(acc[:, None], prop, z)), jnp.mean(acc)

        (key, z), _ = jax.lax.scan(one_step, (key, z), length=rejuvenation_steps)
        return z

    @jax.jit
    def run(key):
        key, kz = jax.random.split(key)
        # init particles from the prior via forward sampling, packed
        def draw_prior(k):
            st = cm.forward_sample(k, state0, names=list(params))
            return pack(st)

        z = jax.vmap(draw_prior)(jax.random.split(kz, N))
        # clip unconstrained coordinates: extreme prior tails can overflow
        # to +-inf (log of an underflowed Gamma draw)
        z = jnp.clip(jnp.nan_to_num(z, nan=0.0, posinf=1e8, neginf=-1e8),
                     -1e8, 1e8)

        def cond(c):
            beta = c[1]
            stage = c[4]
            return (beta < 1.0) & (stage < max_stages)

        def body(c):
            key, beta, z, logZ, stage = c
            ll = loglike(z)
            beta2 = next_beta(beta, ll)
            logw = (beta2 - beta) * ll
            logZ = logZ + jax.nn.logsumexp(logw) - jnp.log(float(N))
            key, kr, kj = jax.random.split(key, 3)
            idx = _systematic_resample(kr, logw, N)
            z = z[idx]
            # proposal scale from resampled particle spread
            scale = 2.38 / jnp.sqrt(float(d)) * jnp.std(z, axis=0) + 1e-6
            z = rejuvenate(kj, z, beta2, scale)
            return key, beta2, z, logZ, stage + 1

        key, beta, z, logZ, stage = jax.lax.while_loop(
            cond, body, (key, jnp.asarray(0.0, dt), z,
                         jnp.asarray(0.0, dt), jnp.asarray(0)))
        ll = loglike(z)
        return z, logZ, stage, ess_frac(jnp.zeros(N, dt))

    key = jax.random.key(seed)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # shard the particle axis; XLA partitions the whole tempering loop
        z_sharding = NamedSharding(mesh, P(particle_axis))
        run_sharded = jax.jit(run, out_shardings=(z_sharding, None, None, None))
        z, logZ, stages, essf = run_sharded(key)
    else:
        z, logZ, stages, essf = run(key)

    values = jax.jit(jax.vmap(lambda v: unpack(v, state0)))(z)

    def _to_host(a):
        if not getattr(a, "is_fully_addressable", True):
            # multi-process mesh: each process holds only its particle
            # shard — all-gather to replicated on device so every host
            # returns the full particle set (same pattern as the engine's
            # monitored-row gather, model/mcmc.py _to_host)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(a.sharding.mesh, PartitionSpec())
            a = jax.jit(lambda x: x, out_shardings=rep)(a)
            a = a.addressable_data(0)
        return np.asarray(a)

    return SMCResult(
        particles={k: _to_host(v) for k, v in values.items()},
        log_evidence=float(logZ), n_stages=int(stages),
        ess_final=float(essf), params=params)
