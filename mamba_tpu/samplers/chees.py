"""ChEES-HMC: cross-chain adaptive trajectory-length HMC (Hoffman, Radul &
Sountsov 2021, "An Adaptive MCMC Scheme for Setting Trajectory Lengths in
Hamiltonian Monte Carlo").

This sampler has no counterpart in the reference — it exists *because* of
the TPU execution model.  Vmapped NUTS runs every chain's variable-depth
trajectory in lockstep, so each Gibbs iteration costs the *maximum* tree
depth over all chains.  ChEES-HMC instead runs plain fixed-length HMC whose
trajectory length is shared by every chain and adapted from cross-chain
statistics (the Change-in-Estimator-of-Expected-Square criterion), giving:

- identical leapfrog counts across chains each iteration (perfect lockstep,
  no masked work) — the per-iteration step count is a *traced* scalar, so
  one compiled program serves every trajectory length;
- jitter shared across chains via a halton(iteration) sequence, not
  per-chain randomness (keeps the lockstep);
- cross-chain adaptation through ``lax.pmean`` over the engine's vmap axis
  (``model.mcmc.CHAIN_AXIS``) — on a sharded mesh this lowers to an
  all-reduce over ICI.

Adaptation (warmup only): step size by Nesterov dual averaging on the
cross-chain mean accept probability; trajectory length by Adam ascent on
the ChEES gradient estimate  E_accept[ (|x'-x̄|^2 - |x-x̄|^2) (x'-x̄)·p' ].

Stand-alone use must bind the chain axis itself::

    step = lambda key, x, tune: chees_step(key, x, tune, logfgrad, adapt)
    jax.vmap(step, axis_name="chains")(keys, xs, tunes)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import SamplerSpec

CHAIN_AXIS = "chains"  # must match model.mcmc.CHAIN_AXIS


class ChEESTune(NamedTuple):
    epsilon: jax.Array      # current step size
    epsilonbar: jax.Array   # dual-averaged step size (used post-warmup)
    Hbar: jax.Array
    mu: jax.Array
    m: jax.Array            # adaptation iteration counter (int32)
    traj: jax.Array         # trajectory length T (time units)
    adam_m: jax.Array       # Adam first moment for d log T
    adam_v: jax.Array       # Adam second moment
    target: jax.Array       # step-size accept target
    max_steps: jax.Array    # safety cap on leapfrog steps per iteration
    minv: jax.Array         # diagonal inverse mass (ones = identity);
                            # seed with a posterior-variance estimate
                            # (e.g. ADVI scales) for badly-scaled blocks
    # cross-chain windowed mass adaptation (warmup only; window == 0
    # disables).  Pooled posterior variance over chains x iterations is
    # decomposed as  E_t[Var_c(x)] + Var_t[E_c(x)]: per iteration the
    # cross-chain moments are pmean'd (identical on every chain, so
    # lockstep is preserved), within-iteration variances accumulate in
    # w_sw, and a Welford recursion over the iteration axis tracks the
    # spread of the cross-chain means (w_mean / w_m2).
    w_n: jax.Array          # iterations accumulated in current window
    w_mean: jax.Array       # running mean of cross-chain means
    w_m2: jax.Array         # Welford M2 of cross-chain means
    w_sw: jax.Array         # sum of within-iteration cross-chain variances
    window: jax.Array       # refresh period (int32; 0 = off)
    it: jax.Array           # total iteration counter (int32) — drives the
                            # halton trajectory jitter and, unlike ``m``,
                            # keeps advancing after warmup: a frozen jitter
                            # index would mean fixed-length HMC post-warmup,
                            # whose periodic trajectories resonate on
                            # near-Gaussian posteriors (the r3 rats ChEES
                            # R-hat 1.22 failure; Hoffman et al. 2021 §3
                            # jitter every iteration)


def _halton2(m):
    """base-2 Halton (van der Corput) value of integer m: bit reversal in
    [0, 1).  Shared across chains because every chain holds the same m."""
    m = m.astype(jnp.uint32)
    bits = jnp.zeros((), jnp.float32)
    scale = jnp.float32(0.5)
    out = jnp.float32(0.0) + bits
    for _ in range(16):
        out = out + jnp.where((m & 1) == 1, scale, 0.0)
        m = m >> 1
        scale = scale * 0.5
    return out


def chees_init(key, x0, logfgrad, epsilon: float | None = None,
               traj: float | None = None, target: float = 0.75,
               max_steps: int = 1024, minv0=None,
               mass_window: int = 0) -> ChEESTune:
    """Tune init; ``epsilon`` defaults to the NUTS doubling search,
    ``traj`` to one initial step.  ``minv0`` seeds the diagonal inverse
    mass (lockstep across chains is preserved because every chain carries
    the same values).  ``mass_window > 0`` refreshes ``minv`` every that
    many warmup iterations from pooled cross-chain statistics (see
    ChEESTune) — the recommended mode above ~1k dimensions, where an
    unseeded identity mass would otherwise force tiny steps on
    badly-scaled posteriors."""
    from .nuts import nutsepsilon

    x0 = jnp.asarray(x0)
    dt = x0.dtype
    if epsilon is None:
        # per-chain doubling searches agree only in order of magnitude;
        # share the geometric mean so every chain starts (and stays) on one
        # common step size
        epsilon = jnp.exp(_pmean(jnp.log(nutsepsilon(key, x0, logfgrad))))
    eps = jnp.asarray(epsilon, dt)
    t0 = jnp.asarray(traj, dt) if traj is not None else eps
    z = jnp.asarray(0.0, dt)
    return ChEESTune(
        epsilon=eps, epsilonbar=eps, Hbar=z,
        mu=jnp.log(10.0 * eps), m=jnp.asarray(0, jnp.int32),
        traj=t0, adam_m=z, adam_v=z,
        target=jnp.asarray(target, dt),
        max_steps=jnp.asarray(max_steps, jnp.int32),
        minv=(jnp.ones_like(x0) if minv0 is None
              else jnp.broadcast_to(jnp.asarray(minv0, dt), x0.shape)),
        w_n=jnp.asarray(0, jnp.int32),
        w_mean=jnp.zeros_like(x0), w_m2=jnp.zeros_like(x0),
        w_sw=jnp.zeros_like(x0),
        window=jnp.asarray(mass_window, jnp.int32),
        it=jnp.asarray(0, jnp.int32))


def _pmean(x):
    try:
        return jax.lax.pmean(x, CHAIN_AXIS)
    except NameError:
        return x


def _axis_size(dt):
    try:
        return jax.lax.psum(jnp.asarray(1.0, dt), CHAIN_AXIS)
    except NameError:
        return jnp.asarray(1.0, dt)


def chees_step(key, x, tune: ChEESTune, logfgrad, adapt):
    """One ChEES-HMC iteration: jittered fixed-length leapfrog + MH, then
    (when ``adapt``) cross-chain dual-averaging / Adam updates.  All chains
    receive identical (traj, epsilon) updates, preserving lockstep."""
    x = jnp.asarray(x)
    dt = x.dtype
    kp, ka = jax.random.split(key)

    eps = jnp.where(adapt, tune.epsilon, tune.epsilonbar)
    h = _halton2(tune.it).astype(dt)
    # jittered trajectory: L = ceil(h * T / eps), in [1, max_steps]
    L = jnp.clip(jnp.ceil(h * tune.traj / eps).astype(jnp.int32),
                 1, tune.max_steps)

    # diagonal mass: p ~ N(0, M) with M = minv^-1, kinetic = p' minv p / 2,
    # dx/dt = minv * p (Neal 2011 eq. 5.29-5.31)
    minv = tune.minv
    p0 = jax.random.normal(kp, x.shape, dt) * jax.lax.rsqrt(minv)
    logf0, grad0 = logfgrad(x)

    def body(c):
        i, xi, pi, logfi, gradi = c
        pi = pi + 0.5 * eps * gradi
        xi = xi + eps * (minv * pi)
        logfi, gradi = logfgrad(xi)
        pi = pi + 0.5 * eps * gradi
        return i + 1, xi, pi, logfi, gradi

    def cond(c):
        return c[0] < L

    _, x1, p1, logf1, grad1 = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), x, p0, logf0, grad0))

    dH = (logf1 - 0.5 * jnp.dot(p1, minv * p1)) \
        - (logf0 - 0.5 * jnp.dot(p0, minv * p0))
    dH = jnp.where(jnp.isnan(dH), -jnp.inf, dH)
    alpha = jnp.minimum(1.0, jnp.exp(dH))
    u = jax.random.uniform(ka, (), dt)
    accept = u < alpha
    x2 = jnp.where(accept, x1, x)

    # ---- cross-chain adaptation -------------------------------------
    abar = _pmean(alpha)

    # dual averaging (Hoffman-Gelman) on the cross-chain accept rate
    mh = (tune.m + 1).astype(dt)
    Hbar = (1.0 - 1.0 / (mh + 10.0)) * tune.Hbar \
        + (tune.target - abar) / (mh + 10.0)
    log_eps = tune.mu - jnp.sqrt(mh) / 0.05 * Hbar
    w = mh ** -0.75
    log_epsbar = w * log_eps + (1.0 - w) * jnp.log(tune.epsilonbar)

    # ChEES gradient for the trajectory length (accept-weighted pmean)
    xbar = _pmean(x)
    d_prop = x1 - xbar
    d_cur = x - xbar
    dsq = jnp.dot(d_prop, d_prop) - jnp.dot(d_cur, d_cur)
    # d ChEES / d T proxy; dx/dt = minv * p under the diagonal metric
    g_chain = dsq * jnp.dot(d_prop, minv * p1) * h
    # divergent trajectories yield non-finite proposals; they carry zero
    # accept probability but 0 * nan would still poison the pmean — mask.
    g_chain = jnp.where(jnp.isfinite(g_chain), g_chain, 0.0)
    g = _pmean(alpha * g_chain) / jnp.maximum(_pmean(alpha), 1e-6)
    # normalize scale so Adam's step is dimensionless
    g = g / jnp.maximum(_pmean(jnp.abs(g)), 1e-12)

    b1, b2, lr = 0.9, 0.95, 0.025
    adam_m = b1 * tune.adam_m + (1.0 - b1) * g
    adam_v = b2 * tune.adam_v + (1.0 - b2) * g * g
    mhat = adam_m / (1.0 - b1 ** mh)
    vhat = adam_v / (1.0 - b2 ** mh)
    log_traj = jnp.log(tune.traj) + lr * mhat / (jnp.sqrt(vhat) + 1e-8)
    new_traj = jnp.clip(jnp.exp(log_traj), tune.epsilon,
                        tune.epsilonbar * tune.max_steps.astype(dt))
    new_traj = jnp.where(jnp.isfinite(new_traj), new_traj, tune.traj)

    # ---- windowed cross-chain mass adaptation (warmup only) ----------
    # pooled variance over chains x window iterations:
    #   Var = E_t[Var_c(x)] + Var_t[E_c(x)]
    # Every term is pmean'd, so all chains apply the identical minv.
    do_w = adapt & (tune.window > 0)
    mc = _pmean(x2)
    vc = _pmean((x2 - mc) ** 2)
    w_n = tune.w_n + jnp.where(do_w, 1, 0).astype(jnp.int32)
    nf = jnp.maximum(w_n, 1).astype(dt)
    delta = mc - tune.w_mean
    w_mean = jnp.where(do_w, tune.w_mean + delta / nf, tune.w_mean)
    w_m2 = jnp.where(do_w, tune.w_m2 + delta * (mc - w_mean), tune.w_m2)
    w_sw = jnp.where(do_w, tune.w_sw + vc, tune.w_sw)
    at_window = do_w & (w_n >= tune.window)
    var = w_sw / nf + w_m2 / jnp.maximum(nf - 1.0, 1.0)
    # Stan-style shrinkage toward 1e-3, weighted by the *effective* sample
    # count (iterations x chains — cross-chain pooling is why a short
    # window suffices here)
    ne = nf * _axis_size(dt)
    var_reg = (ne / (ne + 5.0)) * var + 1e-3 * (5.0 / (ne + 5.0))
    minv_new = jnp.where(at_window, var_reg, tune.minv)
    w_n = jnp.where(at_window, 0, w_n)
    w_mean = jnp.where(at_window, jnp.zeros_like(w_mean), w_mean)
    w_m2 = jnp.where(at_window, jnp.zeros_like(w_m2), w_m2)
    w_sw = jnp.where(at_window, jnp.zeros_like(w_sw), w_sw)
    # a metric change invalidates the step-size statistics: re-center dual
    # averaging on the current epsilon so it re-adapts under the new mass
    Hbar = jnp.where(at_window, 0.0, Hbar)
    mu_new = jnp.where(at_window, jnp.log(10.0) + log_eps, tune.mu)

    new = ChEESTune(
        epsilon=jnp.where(adapt, jnp.exp(log_eps), tune.epsilon),
        epsilonbar=jnp.where(adapt, jnp.exp(log_epsbar), tune.epsilonbar),
        Hbar=jnp.where(adapt, Hbar, tune.Hbar),
        mu=mu_new,
        m=tune.m + jnp.where(adapt, 1, 0).astype(jnp.int32),
        traj=jnp.where(adapt, new_traj, tune.traj),
        adam_m=jnp.where(adapt, adam_m, tune.adam_m),
        adam_v=jnp.where(adapt, adam_v, tune.adam_v),
        target=tune.target, max_steps=tune.max_steps, minv=minv_new,
        w_n=w_n, w_mean=w_mean, w_m2=w_m2, w_sw=w_sw, window=tune.window,
        it=tune.it + 1)
    return x2, new


class ChEESHMC(SamplerSpec):
    """Engine block: ChEES-HMC over a parameter block (transformed space).

    ``ChEESHMC("beta")`` or ``ChEESHMC(["beta", "s2"], target=0.8)``.
    Drop-in replacement for NUTS blocks when running many chains: same
    gradient-based exploration, but every vmapped chain does identical work
    per iteration.

    ``mass_window > 0`` learns a diagonal inverse mass during warmup from
    pooled cross-chain statistics (refreshed every that many iterations;
    lockstep-safe).  ``minv0`` seeds it (e.g. ADVI variational variances);
    with ``mass_window=0`` the seed is held fixed.

    INITIALIZATION CONTRACT: shared cross-chain adaptation assumes every
    chain starts near the posterior's typical set.  Chains initialized far
    away see ~zero accept probability at the pooled step size, freeze, and
    poison the pooled mass/trajectory statistics — and unlike per-chain
    NUTS they cannot recover individually (measured on rats: R-hat 1.7 at
    any warmup length with over-dispersed two-point inits, vs 1.006 from
    ADVI warm-start positions).  Use ADVI warm-start (``infer.advi`` +
    ``ADVIResult.sample`` as inits — the pattern bench.py uses) or a
    single init all chains share; reserve over-dispersed inits for
    per-chain-adaptive samplers."""
    transform = True
    needs_grad = True

    def __init__(self, params, epsilon=None, traj=None, target=0.75,
                 max_steps=1024, minv0=None, mass_window: int = 0):
        super().__init__(params)
        self.epsilon = epsilon
        self.traj = traj
        self.target = target
        self.max_steps = max_steps
        self.minv0 = minv0
        self.mass_window = int(mass_window)

    def kernel_init(self, key, x0, logfgrad):
        return chees_init(key, x0, logfgrad, self.epsilon, self.traj,
                          self.target, self.max_steps, minv0=self.minv0,
                          mass_window=self.mass_window)

    def kernel_step(self, key, x, tune, logfgrad, adapt):
        return chees_step(key, x, tune, logfgrad, adapt)
