"""Binary-state samplers: BHMC, BIA, BMC3, BMG.

TPU-native counterparts of reference src/samplers/{bhmc,bia,bmc3,bmg}.jl.
All four operate on 0/1 vectors with a user/block log-density:

- ``BHMC``  — binary Hamiltonian (wall-bouncing particle, Pakman-Paninski);
  the unbounded wall-hit loop becomes a bounded ``lax.while_loop`` with the
  particle state persisted in the tune across calls (bhmc.jl:55-122).
- ``BIA``   — per-coordinate add/delete proposal probabilities adapted
  toward a target acceptance rate; fully vectorized (bia.jl:70-119).
- ``BMC3``  — flip k random (or one random index-group of) coordinates,
  MH accept (bmc3.jl:57-68).
- ``BMG``   — Metropolised Gibbs: conditional Bernoulli probabilities from
  logf at 0/1, with proposal correction when k > 1 (bmg.jl:57-104).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerSpec, validatebinary


# ---------------------------------------------------------------------------
# BHMC
# ---------------------------------------------------------------------------

class BHMCTune(NamedTuple):
    traveltime: jax.Array
    position: jax.Array
    velocity: jax.Array
    wallhits: jax.Array
    wallcrosses: jax.Array


def bhmc_init(key, x0, traveltime) -> BHMCTune:
    x0 = jnp.asarray(validatebinary(x0))
    dt = x0.dtype
    kp, kv = jax.random.split(key)
    return BHMCTune(
        traveltime=jnp.asarray(traveltime, dt),
        position=jax.random.normal(kp, x0.shape, dt),
        velocity=jax.random.normal(kv, x0.shape, dt),
        wallhits=jnp.asarray(0, jnp.int32),
        wallcrosses=jnp.asarray(0, jnp.int32))


def bhmc_step(key, x, tune: BHMCTune, logf, max_hits: int = 10000):
    """One particle trajectory of length ``traveltime`` (reference
    sample!, bhmc.jl:50-122).

    Deliberate deviation: the reference draws position/velocity once at tune
    construction and never refreshes them (bhmc.jl:14-18 + the tune-reuse
    contract, sampler.jl:37-47), making the trajectory deterministic across
    iterations — a non-ergodic chain (verified numerically: a 1-bit target
    collapses to a point mass).  Pakman & Paninski (2013) refresh momentum
    every trajectory and start the position on the current state's side of
    each wall; that is what this kernel does.
    """
    x = jnp.asarray(x)
    dt = x.dtype
    n = x.shape[0]
    nearzero = 1e4 * np.finfo(np.float64).eps
    kp, kv = jax.random.split(key)
    S0 = 2.0 * x - 1.0
    tune = tune._replace(
        position=jnp.abs(jax.random.normal(kp, (n,), dt)) * S0,
        velocity=jax.random.normal(kv, (n,), dt))

    def cond(c):
        flag, it = c[0], c[8]
        return (~flag) & (it < max_hits)

    def body(c):
        _, a, b, S, jprev, total, hits, crosses, it = c
        phi = jnp.arctan2(b, a)
        walltime = jnp.where(phi > 0.0, jnp.pi - phi, -phi)
        # numerical guard against re-detecting the previous reflection
        guard = (jnp.abs(walltime) < nearzero) | \
                (jnp.abs(walltime - 2.0 * jnp.pi) < nearzero)
        walltime = jnp.where(
            (jnp.arange(n) == jprev) & guard, jnp.inf, walltime)
        j = jnp.argmin(walltime)
        movetime = walltime[j]
        movetime = jnp.where(jnp.isinf(movetime), jnp.pi, movetime)

        total_new = total + movetime
        done = total_new >= tune.traveltime
        movetime = jnp.where(done, movetime - (total_new - tune.traveltime),
                             movetime)
        hits = hits + jnp.where(done, 0, 1)

        vel = a * jnp.cos(movetime) - b * jnp.sin(movetime)
        pos = a * jnp.sin(movetime) + b * jnp.cos(movetime)

        # wall handling (skipped on the final partial move)
        pos_w = pos.at[j].set(0.0)
        S1 = ((S + 1.0) / 2.0).at[j].set(0.0)
        S2 = ((S + 1.0) / 2.0).at[j].set(1.0)
        v2_new = vel[j] ** 2 + jnp.sign(vel[j]) * 2.0 * (logf(S2) - logf(S1))
        cross = v2_new > 0.0
        vel_j = jnp.where(cross, jnp.sqrt(jnp.abs(v2_new)) * jnp.sign(vel[j]),
                          -vel[j])
        vel_w = vel.at[j].set(vel_j)
        S_w = jnp.where(cross, S.at[j].multiply(-1.0), S)
        crosses = crosses + jnp.where((~done) & cross, 1, 0)

        a2 = jnp.where(done, vel, vel_w)
        b2 = jnp.where(done, pos, pos_w)
        S2_ = jnp.where(done, S, S_w)
        return done, a2, b2, S2_, j, total_new, hits, crosses, it + 1

    init = (jnp.asarray(False), tune.velocity, tune.position, S0,
            jnp.asarray(-1), jnp.asarray(0.0, dt), tune.wallhits,
            tune.wallcrosses, jnp.asarray(0, jnp.int32))
    _, vel, pos, _, _, _, hits, crosses, _ = jax.lax.while_loop(
        cond, body, init)
    x2 = (jnp.sign(pos) + 1.0) / 2.0
    return x2, BHMCTune(traveltime=tune.traveltime, position=pos,
                        velocity=vel, wallhits=hits, wallcrosses=crosses)


class BHMC(SamplerSpec):
    transform = False

    def __init__(self, params, traveltime):
        super().__init__(params)
        self.traveltime = float(traveltime)

    def kernel_init(self, key, x0, logf):
        return bhmc_init(key, x0, self.traveltime)

    def kernel_step(self, key, x, tune, logf, adapt):
        return bhmc_step(key, x, tune, logf)


# ---------------------------------------------------------------------------
# BIA
# ---------------------------------------------------------------------------

class BIATune(NamedTuple):
    A: jax.Array
    D: jax.Array
    epsilon: jax.Array
    decay: jax.Array
    target: jax.Array
    iter: jax.Array


def bia_init(x0, A=None, D=None, epsilon=None, decay: float = 0.55,
             target: float = 0.45) -> BIATune:
    x0 = jnp.asarray(validatebinary(x0))
    dt = x0.dtype
    n = x0.shape[0]
    A = jnp.full(n, 1.0 / n, dt) if A is None else jnp.asarray(A, dt)
    D = jnp.full(n, 1.0 / n, dt) if D is None else jnp.asarray(D, dt)
    eps = 0.01 / n if epsilon is None else float(epsilon)
    if not 0.0 < eps < 0.5:
        raise ValueError("epsilon is not in (0, 0.5)")
    if not 0.5 < decay <= 1.0:
        raise ValueError("decay is not in (0.5, 1]")
    return BIATune(A=jnp.clip(A, eps * 1.001, 1 - eps * 1.001),
                   D=jnp.clip(D, eps * 1.001, 1 - eps * 1.001),
                   epsilon=jnp.asarray(eps, dt), decay=jnp.asarray(decay, dt),
                   target=jnp.asarray(target, dt),
                   iter=jnp.asarray(0, jnp.int32))


def bia_step(key, x, tune: BIATune, logf):
    """Vectorized add/delete proposal + per-coordinate adaptation
    (reference sample!, bia.jl:70-119)."""
    x = jnp.asarray(x)
    dt = x.dtype
    ku, ka = jax.random.split(key)
    u = jax.random.uniform(ku, x.shape, dt)
    it = tune.iter + 1

    is0 = x == 0.0
    added = (is0 & (u < tune.A)).astype(dt)
    deleted = (~is0 & (u < tune.D)).astype(dt)
    y = jnp.where(added > 0, 1.0, jnp.where(deleted > 0, 0.0, x))
    log_q_ratio = jnp.sum(added * (jnp.log(tune.D) - jnp.log(tune.A))
                          + deleted * (jnp.log(tune.A) - jnp.log(tune.D)))

    alpha = jnp.minimum(1.0, jnp.exp(logf(y) - logf(x) + log_q_ratio))

    rate = it.astype(dt) ** -tune.decay
    eps = tune.epsilon

    def adapt_probs(P, moved):
        C = (jnp.log((P - eps) / (1.0 - P - eps))
             + rate * moved * (alpha - tune.target))
        return (jnp.exp(C) * (1.0 - eps) + eps) / (1.0 + jnp.exp(C))

    A = adapt_probs(tune.A, added)
    D = adapt_probs(tune.D, deleted)

    accept = jax.random.uniform(ka, (), dt) < alpha
    x2 = jnp.where(accept, y, x)
    return x2, BIATune(A=A, D=D, epsilon=tune.epsilon, decay=tune.decay,
                       target=tune.target, iter=it)


class BIA(SamplerSpec):
    transform = False

    def __init__(self, params, A=None, D=None, epsilon=None,
                 decay: float = 0.55, target: float = 0.45):
        super().__init__(params)
        self.kwargs = dict(A=A, D=D, epsilon=epsilon, decay=decay,
                           target=target)

    def kernel_init(self, key, x0, logf):
        return bia_init(x0, **self.kwargs)

    def kernel_step(self, key, x, tune, logf, adapt):
        return bia_step(key, x, tune, logf)


# ---------------------------------------------------------------------------
# BMC3 / BMG index selection
# ---------------------------------------------------------------------------

def _rand_index_mask(key, n, k: int):
    """Mask of k indices drawn without replacement (reference randind)."""
    perm = jax.random.permutation(key, n)
    sel = perm[:k]
    return jnp.zeros(n, bool).at[sel].set(True)


def _group_mask(key, groups_mask):
    """Pick one of the pre-built group masks uniformly."""
    g = jax.random.randint(key, (), 0, groups_mask.shape[0])
    return groups_mask[g]


def _build_group_masks(groups, n) -> jnp.ndarray:
    masks = np.zeros((len(groups), n), bool)
    for gi, g in enumerate(groups):
        for i in g:
            if not 0 <= i < n:
                raise ValueError(f"index {i} exceeds variate length {n}")
            masks[gi, i] = True
    return jnp.asarray(masks)


# ---------------------------------------------------------------------------
# BMC3
# ---------------------------------------------------------------------------

import dataclasses

from ..utils.pytree import register_dataclass_pytree


@dataclasses.dataclass(frozen=True)
class _IndexSelect:
    """Index-selection tune shared by BMC3/BMG: ``groups_mask`` is a pytree
    child; ``k`` is static aux data so scan carries don't trace it."""
    groups_mask: jax.Array | None   # (G, n) or None for k-form
    k: int = 1


register_dataclass_pytree(_IndexSelect, static_fields=("k",))

BMC3Tune = _IndexSelect


def bmc3_init(x0, k=1) -> BMC3Tune:
    n = jnp.asarray(validatebinary(x0)).shape[0]
    if isinstance(k, int):
        if k > n:
            raise ValueError(f"k exceeds variate length {n}")
        return BMC3Tune(groups_mask=None, k=k)
    return BMC3Tune(groups_mask=_build_group_masks(k, n), k=0)


def bmc3_step(key, x, tune: BMC3Tune, logf):
    """Flip selected coordinates, MH accept (reference bmc3.jl:57-68)."""
    x = jnp.asarray(x)
    ki, ka = jax.random.split(key)
    if tune.groups_mask is None:
        mask = _rand_index_mask(ki, x.shape[0], tune.k)
    else:
        mask = _group_mask(ki, tune.groups_mask)
    y = jnp.where(mask, 1.0 - x, x)
    accept = jnp.log(jax.random.uniform(ka, (), x.dtype)) < logf(y) - logf(x)
    return jnp.where(accept, y, x), tune


class BMC3(SamplerSpec):
    transform = False

    def __init__(self, params, k=1):
        super().__init__(params)
        self.k = k

    def kernel_init(self, key, x0, logf):
        return bmc3_init(x0, self.k)

    def kernel_step(self, key, x, tune, logf, adapt):
        return bmc3_step(key, x, tune, logf)


# ---------------------------------------------------------------------------
# BMG
# ---------------------------------------------------------------------------

BMGTune = _IndexSelect


def bmg_init(x0, k=1) -> BMGTune:
    n = jnp.asarray(validatebinary(x0)).shape[0]
    if isinstance(k, int):
        if k > n:
            raise ValueError(f"k exceeds variate length {n}")
        return BMGTune(groups_mask=None, k=k)
    return BMGTune(groups_mask=_build_group_masks(k, n), k=0)


def bmg_step(key, x, tune: BMGTune, logf):
    """Metropolised Gibbs with conditional Bernoulli proposals (reference
    bmg.jl:57-104)."""
    x = jnp.asarray(x)
    dt = x.dtype
    n = x.shape[0]
    ki, kt, ka = jax.random.split(key, 3)
    if tune.groups_mask is None:
        mask = _rand_index_mask(ki, n, tune.k)
    else:
        mask = _group_mask(ki, tune.groups_mask)

    def cond_probs(z):
        """p_i = invlogit(logf(z_i=1) - logf(z_i=0)) for masked i."""
        def one(i):
            lf0 = logf(z.at[i].set(0.0))
            lf1 = logf(z.at[i].set(1.0))
            p = jax.nn.sigmoid(lf1 - lf0)
            ok = (p > 0.0) & (p < 1.0)
            return jnp.where(ok, p, 0.5)
        return jax.vmap(one)(jnp.arange(n))

    probs_x = cond_probs(x)
    theta = (jax.random.uniform(kt, (n,), dt) < probs_x).astype(dt)
    y = jnp.where(mask, theta, x)

    if n == 1:
        return y, tune

    def masked_logq(probs, z):
        lq = jnp.where(z == 1.0, jnp.log(probs), jnp.log1p(-probs))
        return jnp.sum(jnp.where(mask, lq, 0.0))

    qy = masked_logq(probs_x, y)
    probs_y = cond_probs(y)
    qx = masked_logq(probs_y, x)
    accept = jnp.log(jax.random.uniform(ka, (), dt)) < \
        (logf(y) - qy) - (logf(x) - qx)
    return jnp.where(accept, y, x), tune


class BMG(SamplerSpec):
    transform = False

    def __init__(self, params, k=1):
        super().__init__(params)
        self.k = k

    def kernel_init(self, key, x0, logf):
        return bmg_init(x0, self.k)

    def kernel_step(self, key, x, tune, logf, adapt):
        return bmg_step(key, x, tune, logf)
