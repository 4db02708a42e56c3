"""No-U-Turn sampler with dual-averaging step-size adaptation.

TPU-native rebuild of reference src/samplers/nuts.jl (Hoffman & Gelman 2014,
Algorithm 6).  Two design deltas forced by XLA (SURVEY.md §7.4):

1. The reference's recursive ``buildtree`` (nuts.jl:139-180) becomes an
   *iterative* doubling build under ``lax.while_loop``: each doubling extends
   the trajectory by ``2^j`` leapfrog steps in one direction, with the
   recursive sub-U-turn checks replaced by the checkpoint-buffer scheme of
   Phan et al. (iterative NUTS): even-indexed leaves are stored in a
   ``max_depth``-slot buffer, odd-indexed leaves are checked against the
   buffered start states of every subtree they close.  Statistically
   equivalent to the recursion; compiles to a single XLA program.
2. Gradients are exact JAX autodiff instead of the reference's
   finite differences (src/model/simulation.jl:47-51).

The slice-variable formulation, uniform proposal selection within the
candidate set (reservoir sampling = the recursion's ``rand() <
n'2/(n'1+n'2)`` combines), divergence cutoff (+1000), U-turn criterion
(nuts.jl:183-187), and the Hoffman-Gelman dual-averaging schedule
(nuts.jl:63-92) all match the reference exactly.  The only intentional
difference is a finite ``max_depth`` (default 10, as in Stan) — the
reference doubles unboundedly (nuts.jl:109).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.backend import nuts_unroll
from .base import SamplerSpec


class NUTSTune(NamedTuple):
    epsilon: jax.Array
    epsilonbar: jax.Array
    Hbar: jax.Array
    mu: jax.Array
    m: jax.Array          # int32 adaptation counter
    alpha: jax.Array      # last doubling's accept-stat sum (diagnostics)
    nalpha: jax.Array
    depth: jax.Array      # tree depth of the last transition (diagnostics;
                          # under vmap the iteration cost is 2^max(depth)
                          # over all lockstep chains — see docs/perf.md)
    # dual-averaging constants (arrays so the tune is a uniform scan carry)
    gamma: jax.Array
    kappa: jax.Array
    t0: jax.Array
    target: jax.Array
    # diagonal mass-matrix adaptation (beyond the reference, which runs
    # identity-mass NUTS only): minv is the inverse mass = running posterior
    # variance estimate, learned from Welford statistics over warmup windows
    # (Stan-style).  window == 0 disables adaptation.
    minv: jax.Array
    w_n: jax.Array
    w_mean: jax.Array
    w_m2: jax.Array
    window: jax.Array


def _leapfrog(x, r, grad, eps, logfgrad, minv=None):
    """One leapfrog step (reference nuts.jl:129-136); ``minv`` is the
    diagonal inverse mass (None = identity)."""
    r = r + (0.5 * eps) * grad
    x = x + eps * (r if minv is None else minv * r)
    logf, grad = logfgrad(x)
    r = r + (0.5 * eps) * grad
    return x, r, logf, grad


def _kinetic(r, minv):
    return 0.5 * (jnp.dot(r, r) if minv is None else jnp.dot(r, minv * r))


def nutsepsilon(key, x, logfgrad):
    """Initial step size by doubling/halving search (reference
    nuts.jl:192-205)."""
    x = jnp.asarray(x)
    dt = x.dtype
    r0 = jax.random.normal(key, x.shape, dt)
    logf0, grad0 = logfgrad(x)

    def probe(eps):
        _, rp, logfp, _ = _leapfrog(x, r0, grad0, eps, logfgrad)
        prob = jnp.exp(logfp - logf0
                       - 0.5 * (jnp.dot(rp, rp) - jnp.dot(r0, r0)))
        # NaN (diverged probe) counts as accept-prob 0 so the search halves
        # the step instead of silently returning the current epsilon
        return jnp.where(jnp.isnan(prob), 0.0, prob)

    eps = jnp.asarray(1.0, dt)
    prob = probe(eps)
    pm = jnp.where(prob > 0.5, 1.0, -1.0).astype(dt)

    def cond(c):
        eps, prob, it = c
        return (prob ** pm > 0.5 ** pm) & (it < 100)

    def body(c):
        eps, _, it = c
        eps = eps * 2.0 ** pm
        return eps, probe(eps), it + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps, prob, jnp.asarray(0)))
    return eps


def nuts_init(key, x0, logfgrad, epsilon=None, target: float = 0.6,
              mass_window: int = 0, minv0=None) -> NUTSTune:
    """Tune init (reference NUTSTune ctor, nuts.jl:22-27; epsilon search when
    not given, nuts.jl:29-30).  ``minv0`` seeds the diagonal inverse mass
    with a posterior-variance estimate (e.g. ADVI's variational scales);
    with ``mass_window == 0`` it is used as-is, never refreshed."""
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    if epsilon is None:
        epsilon = nutsepsilon(key, x0, logfgrad)
    z = jnp.asarray(0.0, dt)
    return NUTSTune(
        epsilon=jnp.asarray(epsilon, dt), epsilonbar=jnp.asarray(1.0, dt),
        Hbar=z, mu=z, m=jnp.asarray(0, jnp.int32), alpha=z,
        nalpha=jnp.asarray(0, jnp.int32), depth=jnp.asarray(0, jnp.int32),
        gamma=jnp.asarray(0.05, dt), kappa=jnp.asarray(0.75, dt),
        t0=jnp.asarray(10.0, dt), target=jnp.asarray(target, dt),
        minv=(jnp.ones_like(x0) if minv0 is None
              else jnp.broadcast_to(jnp.asarray(minv0, dt), x0.shape)),
        w_n=jnp.asarray(0, jnp.int32),
        w_mean=jnp.zeros_like(x0), w_m2=jnp.zeros_like(x0),
        window=jnp.asarray(
            mass_window if (mass_window or minv0 is None) else 2**30,
            jnp.int32))


# ---------------------------------------------------------------------------
# iterative tree building
# ---------------------------------------------------------------------------

def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


def _ckpt_idxs(leaf):
    """Checkpoint slot range closed by leaf (see module docstring).
    ``idx_max`` = popcount(leaf >> 1); ``idx_min`` = idx_max - (trailing
    ones of leaf) + 1."""
    idx_max = _popcount(leaf >> 1)
    trailing_ones = _popcount(leaf) - _popcount(leaf & (leaf + 1))
    idx_min = idx_max - trailing_ones + 1
    return idx_min, idx_max


def _subtree_turned(x_ck, r_ck, x, r, pm, idx_min, idx_max, max_depth, minv):
    """U-turn between the current (odd) leaf and every buffered subtree
    start it closes.  Criterion oriented by build direction ``pm``:
    dx = pm * (x_new - x_start); turned iff dx.v_start < 0 or dx.v_new < 0
    with v the velocity minv*r (reference nouturn, nuts.jl:183-187)."""
    def vel(r):
        return r if minv is None else minv * r

    def body(i, turned):
        dx = pm * (x - x_ck[i])
        t = (jnp.dot(dx, vel(r_ck[i])) < 0) | (jnp.dot(dx, vel(r)) < 0)
        inrange = (i >= idx_min) & (i <= idx_max)
        return turned | (t & inrange)

    # Trace-time unroll (max_depth is static and small): on TPU a fori_loop
    # here nests loops three deep (doubling -> subtree-while -> fori) and
    # with a traced minv referenced in every level the TPU compiler's pass
    # pipeline goes pathological when further while_loop blocks follow in
    # the same program (measured v5e: rats NUTS(mass)+3-coord Slice 574 s
    # -> ~20 s with the unroll).  Runtime also wins: 10 dim-62 dot pairs
    # beat a device loop's per-trip overhead.  The CPU/GSPMD backend
    # handles the fori_loop fine (utils/backend.py).
    if nuts_unroll():
        turned = jnp.asarray(False)
        for i in range(max_depth):
            turned = body(i, turned)
        return turned
    return jax.lax.fori_loop(0, max_depth, body, jnp.asarray(False))


def _build_subtree(key, x0, r0, grad0, pm, j, eps, logfgrad, logp0, logu0,
                   x_ck, r_ck, max_depth, dt, minv=None, active=None):
    """Build ``2**j`` leapfrog steps in direction ``pm`` from end state
    (x0, r0, grad0).  Returns the new end state, the subtree's uniform
    proposal, candidate count n', validity s', and accept stats — the same
    contract as the reference's recursive buildtree (nuts.jl:139-180).

    ``active`` gates the whole build (used by the unrolled doubling loop in
    nuts_sub): a chain whose trajectory already terminated starts with
    sprime=False, so its subtree while_loop exits immediately — under vmap
    the loop then runs only as long as ANY chain is still building, exactly
    like the nested-while formulation."""
    nleaf = jnp.left_shift(1, j)

    def cond(c):
        leaf = c[0]
        sprime = c[8]
        return (leaf < nleaf) & sprime

    def body(c):
        (leaf, key, x, r, grad, xprop, nprime, _logf, sprime, alpha, nalpha,
         x_ck, r_ck) = c
        x, r, logf, grad = _leapfrog(x, r, grad, pm * eps, logfgrad, minv)
        logp = logf - _kinetic(r, minv)
        # a diverged trajectory can hit NaN log-densities (e.g. a Cholesky
        # of a wildly indefinite matrix); treat as -inf so the divergence
        # machinery fires instead of NaN-poisoning the accept statistics
        # (which would freeze dual averaging — and the chain — permanently)
        logp = jnp.where(jnp.isnan(logp), -jnp.inf, logp)
        valid = logu0 < logp
        diverged = ~(logu0 < logp + 1000.0)
        nprime = nprime + valid.astype(jnp.int32)
        alpha = alpha + jnp.minimum(1.0, jnp.exp(logp - logp0)).astype(dt)
        nalpha = nalpha + 1

        # reservoir selection = uniform draw over valid leaves (equivalent
        # to the recursion's pairwise n'2/(n'1+n'2) combines)
        key, ku = jax.random.split(key)
        u = jax.random.uniform(ku, (), dt)
        take = valid & (u * nprime.astype(dt) < 1.0)
        xprop = jnp.where(take, x, xprop)

        idx_min, idx_max = _ckpt_idxs(leaf)
        even = (leaf % 2) == 0
        x_ck = jnp.where(even, x_ck.at[idx_max].set(x), x_ck)
        r_ck = jnp.where(even, r_ck.at[idx_max].set(r), r_ck)
        turned = jnp.where(
            even, False,
            _subtree_turned(x_ck, r_ck, x, r, pm, idx_min, idx_max,
                            max_depth, minv))

        sprime = sprime & ~diverged & ~turned
        return (leaf + 1, key, x, r, grad, xprop, nprime, logf, sprime,
                alpha, nalpha, x_ck, r_ck)

    s0 = jnp.asarray(True) if active is None else active
    init = (jnp.asarray(0, jnp.int32), key, x0, r0, grad0, x0,
            jnp.asarray(0, jnp.int32), jnp.asarray(0.0, dt),
            s0, jnp.asarray(0.0, dt), jnp.asarray(0, jnp.int32),
            x_ck, r_ck)
    (_, key, x, r, grad, xprop, nprime, _, sprime, alpha, nalpha, x_ck, r_ck
     ) = jax.lax.while_loop(cond, body, init)
    return key, x, r, grad, xprop, nprime, sprime, alpha, nalpha


def nuts_sub(key, x, epsilon, logfgrad, max_depth=10, minv=None):
    """One NUTS transition at fixed step size (reference nuts_sub!,
    nuts.jl:95-126).  With ``minv``, momenta are drawn from N(0, M) and the
    dynamics use the diagonal metric."""
    x = jnp.asarray(x)
    dt = x.dtype
    dim = x.shape[0]
    key, kr, ku = jax.random.split(key, 3)

    z = jax.random.normal(kr, (dim,), dt)
    r0 = z if minv is None else z / jnp.sqrt(minv)
    logf0, grad0 = logfgrad(x)
    logp0 = logf0 - _kinetic(r0, minv)
    logu0 = logp0 + jnp.log(jax.random.uniform(ku, (), dt))

    x_ck = jnp.zeros((max_depth, dim), dt)
    r_ck = jnp.zeros((max_depth, dim), dt)

    def body(j, c):
        (jdone, key, xm, rm, gm, xp, rp, gp, xcur, n, _s, alpha, nalpha) = c
        key, kd, ka = jax.random.split(key, 3)
        pm = jnp.where(jax.random.uniform(kd, (), dt) > 0.5, 1.0, -1.0).astype(dt)

        # extend from the chosen end; select end by pm
        x_end = jnp.where(pm < 0, xm, xp)
        r_end = jnp.where(pm < 0, rm, rp)
        g_end = jnp.where(pm < 0, gm, gp)
        (key, x_new, r_new, g_new, xprop, nprime, sprime, alpha2, nalpha2
         ) = _build_subtree(key, x_end, r_end, g_end, pm, j, epsilon,
                            logfgrad, logp0, logu0, x_ck, r_ck, max_depth,
                            dt, minv, active=_s)
        xm = jnp.where(pm < 0, x_new, xm)
        rm = jnp.where(pm < 0, r_new, rm)
        gm = jnp.where(pm < 0, g_new, gm)
        xp = jnp.where(pm < 0, xp, x_new)
        rp = jnp.where(pm < 0, rp, r_new)
        gp = jnp.where(pm < 0, gp, g_new)

        accept = sprime & (jax.random.uniform(ka, (), dt) * n.astype(dt)
                           < nprime.astype(dt))
        xcur = jnp.where(accept, xprop, xcur)
        n = n + nprime
        xdiff = xp - xm
        vm = rm if minv is None else minv * rm
        vp = rp if minv is None else minv * rp
        s = sprime & (jnp.dot(xdiff, vm) >= 0) & (jnp.dot(xdiff, vp) >= 0)
        return (jdone + 1, key, xm, rm, gm, xp, rp, gp, xcur, n, s, alpha2,
                nalpha2)

    # Formulation of the doubling loop is backend-selected
    # (utils/backend.py):
    #
    # TPU — trace-time unroll (max_depth is static, 10 by default):
    # 1. COMPILE TIME: scan(iterations) -> while(doublings) ->
    #    while(subtree) is a three-deep loop nest; with a traced diagonal
    #    mass referenced at every level the TPU compiler's pass pipeline is
    #    pathological (measured v5e, rats 1024 chains: 574 s cold compile;
    #    unrolled: ~1 min).  Unrolled, the program is scan -> while —
    #    sibling subtree loops with *static* per-level leaf counts.
    # 2. RUNTIME PARITY: under vmap the subtree while_loop already runs
    #    until every chain's subtree is done, and each level's loop exits
    #    immediately once all chains have stopped (batched cond), so the
    #    unrolled levels a stopped iteration never needed cost one select
    #    each, not leapfrogs.
    # Per-chain semantics match the while_loop exactly: a stopped chain's
    # carry (including its RNG key) is frozen by the `s` select below.
    #
    # CPU/GSPMD — outer lax.while_loop: the unrolled program's 10 sibling
    # subtree loops, each touching the (potentially sharded) checkpoint
    # buffers, regress the 8-device GSPMD/CPU compile >200x (11 s ->
    # 35+ min, round-3 verdict).  The nested form compiles in seconds
    # there.  Both formulations are bit-identical on kept samples
    # (f540c10 A/B; enforced by tests/test_samplers.py).
    c0 = (jnp.asarray(0, jnp.int32), key, x, r0, grad0, x, r0, grad0, x,
          jnp.asarray(1, jnp.int32), jnp.asarray(True),
          jnp.asarray(1.0, dt), jnp.asarray(1, jnp.int32))
    if nuts_unroll():
        c = c0
        for j in range(max_depth):
            s = c[10]
            c_new = body(j, c)
            c = jax.tree_util.tree_map(
                lambda new, old: jnp.where(s, new, old), c_new, c)
    else:
        def cond(c):
            return c[10] & (c[0] < max_depth)

        def wbody(c):
            return body(c[0], c)

        c = jax.lax.while_loop(cond, wbody, c0)
    jdone, xcur, alpha, nalpha = c[0], c[8], c[11], c[12]
    return xcur, alpha, nalpha, jdone


def nuts_step(key, x, tune: NUTSTune, logfgrad, adapt, max_depth=10):
    """NUTS transition + dual-averaging update (reference sample!,
    nuts.jl:63-92).  ``adapt`` is a traced bool; the whole function is one
    XLA program covering both warmup and sampling phases."""
    x = jnp.asarray(x)
    dt = x.dtype
    adapt = jnp.asarray(adapt)

    # setadapt!: entering adaptation at m == 0 fixes mu = log(10 eps)
    mu = jnp.where(adapt & (tune.m == 0), jnp.log(10.0 * tune.epsilon), tune.mu)
    # Frozen phase uses epsilonbar once adaptation has EVER run
    # (nuts.jl:83).  "Ever run" is epsilonbar != its 1.0 init, NOT m > 0:
    # m resets at each mass-window refresh (full re-adaptation gain, r4
    # advisor), so a refresh landing on the final warmup iteration leaves
    # m == 0 — the frozen chain must still use the pre-refresh averaged
    # step, not the noisier instantaneous epsilon (regression: rats with
    # mass_window=100 and warmup exactly 300 froze an unretuned step and
    # left chains unconverged, test_rats_sharded_posterior_parity).
    adapted_ever = tune.epsilonbar != 1.0
    eps_used = jnp.where(adapt, tune.epsilon,
                         jnp.where(adapted_ever, tune.epsilonbar,
                                   tune.epsilon))

    use_mass = tune.window > 0
    minv = jnp.where(use_mass, tune.minv, jnp.ones_like(tune.minv))
    x2, alpha, nalpha, depth = nuts_sub(key, x, eps_used, logfgrad,
                                        max_depth, minv=minv)

    # Welford update + windowed inverse-mass refresh (warmup only).
    # Stan-style EXPANDING windows: each refresh doubles the next window
    # length, so the early (short) windows only steer the chain while the
    # final (long) window — by which time the chain has left its init
    # transient — decides the mass actually used for sampling.  A fixed
    # window is an adaptation trap: a chain still traveling from a far-off
    # init bakes its transient variance into minv (measured: minv ~1500 vs
    # converged ~9 on rats), its step size then collapses against the bad
    # metric, and post-warmup it is frozen at depth 1 forever.
    do_w = adapt & use_mass
    w_n = tune.w_n + jnp.where(do_w, 1, 0).astype(jnp.int32)
    delta = x2 - tune.w_mean
    w_mean = jnp.where(do_w, tune.w_mean + delta / jnp.maximum(w_n, 1), tune.w_mean)
    w_m2 = jnp.where(do_w, tune.w_m2 + delta * (x2 - w_mean), tune.w_m2)
    at_window = do_w & (w_n >= tune.window)
    nw = jnp.maximum(w_n, 2).astype(dt)
    var = w_m2 / (nw - 1.0)
    var_reg = (nw / (nw + 5.0)) * var + 1e-3 * (5.0 / (nw + 5.0))
    minv_new = jnp.where(at_window, var_reg, tune.minv)
    w_n = jnp.where(at_window, 0, w_n)
    w_mean = jnp.where(at_window, jnp.zeros_like(w_mean), w_mean)
    w_m2 = jnp.where(at_window, jnp.zeros_like(w_m2), w_m2)
    window_new = jnp.where(at_window, tune.window * 2, tune.window)

    m = tune.m + jnp.where(adapt, 1, 0).astype(jnp.int32)
    mf = m.astype(dt)
    p = 1.0 / (mf + tune.t0)
    Hbar_new = (1.0 - p) * tune.Hbar + p * (tune.target
                                            - alpha / jnp.maximum(nalpha, 1).astype(dt))
    eps_new = jnp.exp(mu - jnp.sqrt(mf) * Hbar_new / tune.gamma)
    p2 = mf ** -tune.kappa
    epsbar_new = jnp.exp(p2 * jnp.log(eps_new) + (1.0 - p2) * jnp.log(tune.epsilonbar))

    # a metric change invalidates the step-size statistics: re-center dual
    # averaging on the current step so it re-adapts under the new mass
    # (same recovery rule as ChEES, samplers/chees.py).  The counter m is
    # reset too (r4 advisor): the correction gain decays ~1/sqrt(m), so a
    # late refresh with a large m would re-adapt far more slowly than
    # Stan's restart-the-window scheme; with m=0 the next window gets full
    # early-iteration gain (and epsilonbar restarts from the new eps, as
    # p2 = m^-kappa = 1 at m=1).
    Hbar_new = jnp.where(at_window, jnp.zeros_like(Hbar_new), Hbar_new)
    mu = jnp.where(at_window, jnp.log(10.0 * eps_new), mu)
    m = jnp.where(at_window, jnp.zeros_like(m), m)

    new = NUTSTune(
        epsilon=jnp.where(adapt, eps_new, eps_used),
        epsilonbar=jnp.where(adapt, epsbar_new, tune.epsilonbar),
        Hbar=jnp.where(adapt, Hbar_new, tune.Hbar),
        mu=mu, m=m, alpha=alpha,
        nalpha=nalpha, depth=depth, gamma=tune.gamma, kappa=tune.kappa, t0=tune.t0,
        target=tune.target, minv=minv_new, w_n=w_n, w_mean=w_mean,
        w_m2=w_m2, window=window_new)
    return x2, new


class NUTS(SamplerSpec):
    """NUTS(params; epsilon=None, target=0.6, max_depth=10,
    mass_window=0) — adapts during burnin, frozen step size after
    (reference NUTS ctor nuts.jl:47-56).

    ``mass_window > 0`` additionally learns a diagonal mass matrix over
    warmup windows, the FIRST of that many iterations and each subsequent
    window twice as long (Stan-style expanding schedule; the final window
    dominates, after init transients have died).  Beyond the reference —
    its NUTS is identity-mass only; a badly-scaled posterior like rats
    gains an order of magnitude in ESS/draw.  ``minv0`` seeds the inverse mass with
    a posterior-variance estimate in the block's unconstrained ravel order
    (e.g. ``ADVIResult.unconstrained_variances()``); with ``mass_window=0``
    the seed is used as-is and never refreshed."""

    transform = True
    needs_grad = True

    def __init__(self, params, epsilon=None, target: float = 0.6,
                 max_depth: int = 10, mass_window: int = 0, minv0=None):
        super().__init__(params)
        self.epsilon = epsilon
        self.target = float(target)
        self.max_depth = int(max_depth)
        self.mass_window = int(mass_window)
        self.minv0 = minv0

    def kernel_init(self, key, x0, logfgrad):
        def lf(v):
            return logfgrad(v)
        return nuts_init(key, x0, lf, epsilon=self.epsilon,
                         target=self.target, mass_window=self.mass_window,
                         minv0=self.minv0)

    def kernel_step(self, key, x, tune, logfgrad, adapt):
        return nuts_step(key, x, tune, logfgrad, adapt, self.max_depth)
