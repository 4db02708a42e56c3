"""Model-based posterior statistics: DIC, posterior-predictive draws, and
log-density over stored draws.

TPU-native counterpart of reference src/output/modelstats.jl.  The
reference re-walks the interpreted graph per stored draw per chain, farming
chains to processes (modelstats.jl:30-68); here draw states are
reconstructed from the stored columns and the log-density / predictive
sampler is one jitted ``vmap(vmap(...))`` over (chains, draws) — the whole
post-hoc pass is a single device program.  The reference's getsimkeys DAG
pruning (modelstats.jl:107-132) happens implicitly via XLA dead-code
elimination.

Requires every *sampled* stochastic node to be monitored (the reference has
the same practical requirement: relist reads stored columns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .chains import Chains, ModelChains
from .chainsummary import ChainSummary
from .stats import _header


def _site_columns(mc: ModelChains):
    """Column index ranges of each stored site, in monitor-spec order."""
    cm = mc.compiled
    monitored, labels, _ = cm.monitor_spec()
    if labels != mc.names:
        raise ValueError("chain columns do not match the model's monitor spec")
    cols = {}
    off = 0
    for n in monitored:
        shape = cm.sites[n].shape if n in cm.sites else cm.logical_shapes[n]
        size = int(np.prod(shape)) if shape else 1
        idx = cm.model.nodes[n].monitor_indices(size)
        if idx is None:
            cols[n] = (off, shape)
            off += size
        else:
            # partially-monitored nodes can't be reconstructed from storage
            off += len(idx)
    return cols


def _unpack_site(flat_cols, shape):
    """Invert the engine's column-major (Julia ``vec``) flattening."""
    if not shape:
        return flat_cols[..., 0]
    if len(shape) == 1:
        return flat_cols
    rev = flat_cols.reshape(flat_cols.shape[:-1] + tuple(reversed(shape)))
    perm = tuple(range(flat_cols.ndim - 1)) + tuple(
        flat_cols.ndim - 1 + i for i in reversed(range(len(shape))))
    return jnp.transpose(rev, perm)


def _draw_state_fn(mc: ModelChains):
    """Returns (base_states, fn) with fn(row, chain_base) -> full site state
    for one stored draw; unsampled/unstored sites come from the chain's
    final state."""
    cm = mc.compiled
    cols = _site_columns(mc)
    stored_stoch = [n for n in cm.stochastic if n in cols]
    missing = [n for n in cm.stochastic
               if n not in cols and n not in cm.observed
               and n in set(mc.model.keys("sampled"))]
    if missing:
        raise ValueError(
            f"sampled nodes {missing} are not monitored; model-based stats "
            "need their stored draws")

    def fn(row, chain_state):
        state = dict(chain_state)
        for n in stored_stoch:
            off, shape = cols[n]
            size = int(np.prod(shape)) if shape else 1
            seg = jax.lax.dynamic_slice_in_dim(row, off, size, axis=-1)
            state[n] = _unpack_site(seg, shape).astype(cm.dtype)
        return state

    return fn


def _chain_bases(mc: ModelChains):
    """Final per-chain state dicts (carry the observed-data values)."""
    st = mc.states["state"]
    return [jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[k]), st)
            for k in range(mc.nchains)]


def logpdf_chains(mc: ModelChains, nodekeys=None) -> Chains:
    """Per-draw total log-density (reference logpdf(mc), modelstats.jl:30-68)
    as a 1-parameter Chains named 'logpdf'."""
    cm = mc.compiled
    if nodekeys is None:
        nodekeys = cm.stochastic
    elif isinstance(nodekeys, str):
        nodekeys = [nodekeys]
    draw_state = _draw_state_fn(mc)

    def one(row, base):
        return cm.logpdf(draw_state(row, base), terms=tuple(nodekeys))

    rows = jnp.asarray(mc.value.transpose(2, 0, 1))   # (chains, n, p)
    bases = _chain_bases(mc)
    base_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *bases)
    vals = jax.jit(jax.vmap(jax.vmap(one, in_axes=(0, None)),
                            in_axes=(0, 0)))(rows, base_stack)
    value = np.asarray(vals).T[:, None, :]            # (n, 1, chains)
    return Chains(value, start=mc.start, thin=mc.thin, names=["logpdf"],
                  chains=mc.chains)


def logpdf_at(mc: ModelChains, f, nodekeys=None) -> float:
    """Log-density at a draw summary (e.g. posterior mean) — the plug-in
    term of DIC (reference modelstats.jl:15-25)."""
    cm = mc.compiled
    if nodekeys is None:
        nodekeys = cm.stochastic
    draw_state = _draw_state_fn(mc)
    row = jnp.asarray(f(np.asarray(mc.value), axis=(0, 2)))
    base = _chain_bases(mc)[0]
    return float(jax.jit(
        lambda r, b: cm.logpdf(draw_state(r, b), terms=tuple(nodekeys)))(
        row, base))


def dic(mc: ModelChains) -> ChainSummary:
    """Deviance information criterion with pD and pV effective-parameter
    estimates (reference modelstats.jl:3-12)."""
    outputs = mc.model.keys("observed")
    Dhat = -2.0 * logpdf_at(mc, np.mean, outputs)
    D = -2.0 * logpdf_chains(mc, outputs).value
    p = np.array([D.mean() - Dhat, 0.5 * D.var(ddof=1)])
    vals = np.column_stack([Dhat + 2.0 * p, p])
    return ChainSummary(vals, ["pD", "pV"], ["DIC", "Effective Parameters"],
                        _header(mc))


def predict(mc: ModelChains, nodekeys=None, seed: int = 0) -> ModelChains:
    """Posterior-predictive draws of observed output nodes for every stored
    draw (reference modelstats.jl:71-102)."""
    cm = mc.compiled
    outputs = mc.model.keys("observed")
    if nodekeys is None:
        nodekeys = outputs
    elif isinstance(nodekeys, str):
        nodekeys = [nodekeys]
    bad = [k for k in nodekeys if k not in outputs]
    if bad:
        raise ValueError(f"nodekeys {bad} are not observed stochastic nodes")
    draw_state = _draw_state_fn(mc)

    from ..utils.pytree import elementwise_names
    labels = []
    for n in nodekeys:
        labels.extend(elementwise_names(n, cm.sites[n].shape))

    def one(key, row, base):
        state = cm.forward_sample(key, draw_state(row, base), names=nodekeys)
        flat = []
        for n in nodekeys:
            v = state[n]
            v = jnp.reshape(jnp.transpose(v), (-1,)) if v.ndim > 1 else jnp.reshape(v, (-1,))
            flat.append(v)
        return jnp.concatenate(flat)

    rows = jnp.asarray(mc.value.transpose(2, 0, 1))
    bases = _chain_bases(mc)
    base_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *bases)
    n, m = mc.niter, mc.nchains
    keys = jax.vmap(lambda i: jax.vmap(lambda j: jax.random.fold_in(
        jax.random.fold_in(jax.random.key(seed), i), j))(jnp.arange(n)))(
        jnp.arange(m))
    vals = jax.jit(jax.vmap(jax.vmap(one, in_axes=(0, 0, None)),
                            in_axes=(0, 0, 0)))(keys, rows, base_stack)
    value = np.moveaxis(np.asarray(vals), 0, 2)       # (n, q, chains)
    out = ModelChains(value, start=mc.start, thin=mc.thin, names=labels,
                      chains=mc.chains, model=mc.model, compiled=cm,
                      states=mc.states, iter=mc.iter)
    return out
