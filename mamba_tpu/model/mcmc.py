"""MCMC engine: the whole run is ONE compiled XLA program per phase.

TPU-native counterpart of reference src/model/mcmc.jl.  Where the reference
farms chains out to OS processes via pmap (mcmc.jl:36-59, utils.jl:91-98) and
interprets the Gibbs block loop per iteration (simulation.jl:93-107), here:

- chains are a ``vmap`` axis (one chip computes all chains in lockstep;
  sharding over a mesh scales further — see parallel/),
- the iteration loop is ``lax.scan`` (burnin phase without outputs, then a
  kept-sample phase emitting one monitored row per ``thin`` inner steps),
- the Gibbs block loop is unrolled at trace time (one fused program),
- adaptation ("iter <= burnin", e.g. nuts.jl:52) is a traced bool so warmup
  and sampling share one compiled step function.

Checkpoint/resume matches the reference contract (mcmc.jl:3-16): the
returned ModelChains carries per-chain resume pytrees (values + tunes + RNG
keys — the ModelState equivalent, src/Mamba.jl:152-155) and ``mcmc(mc,
iters)`` continues exactly, including adaptive tune state.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..output.chains import ModelChains
from .compile import CompiledModel, compile_model
from .model import Model


def _chain_inits(cm: CompiledModel, inits, chains: int):
    """Per-chain initial constrained states.  ``inits`` is a dict or a list
    of dicts recycled over chains (reference mcmc.jl:27-31)."""
    if isinstance(inits, dict):
        inits = [inits]
    # assembled host-side in numpy: one device transfer per site instead of
    # chains x sites eager device ops (slow over a remote-TPU tunnel)
    stacked = {}
    for name in cm.stochastic:
        rows = []
        for k in range(chains):
            d = inits[k % len(inits)]
            if name not in d:
                raise ValueError(f"chain {k}: no init for stochastic node {name!r}")
            rows.append(np.broadcast_to(
                np.asarray(d[name], dtype=np.float64), cm.sites[name].shape))
        stacked[name] = jnp.asarray(np.stack(rows), cm.dtype)

    # NaN inits mark missing data (reference MISS semantics, miss.jl:44-52):
    # prior-impute them before the first iteration so kernel initialization
    # sees finite log-densities.
    nan_sites = [n for n in cm.stochastic
                 if np.isnan(np.asarray(stacked[n])).any()]
    bad = [n for n in nan_sites
           if not getattr(cm.example_dists[n], "supports_imputation", True)]
    if bad:
        raise ValueError(
            f"sites {bad} have missing (NaN) values but their distribution "
            f"shares one value array across all chains (e.g. the fused "
            f"BernoulliLogitGLMM kernel) — per-chain MISS imputation would "
            f"silently evaluate every chain against chain 0's data. "
            f"Rebuild the model with the generic likelihood (fused=False).")
    if nan_sites:
        masks = {n: jnp.asarray(np.isnan(np.asarray(stacked[n])))
                 for n in nan_sites}

        def impute_chain(key, state, *mask_leaves):
            nonlocal_masks = dict(zip(nan_sites, mask_leaves))
            filled = {n: jnp.nan_to_num(v) for n, v in state.items()}
            draws = cm.forward_sample(key, filled, names=nan_sites)
            return {n: (jnp.where(nonlocal_masks[n], draws[n], v)
                        if n in nan_sites else v)
                    for n, v in state.items()}

        ikeys = jax.jit(jax.vmap(lambda i: jax.random.fold_in(
            jax.random.key(777), i)))(jnp.arange(chains))
        stacked = jax.jit(jax.vmap(impute_chain))(
            ikeys, stacked, *[masks[n] for n in nan_sites])
    return stacked


#: vmap axis name bound over the chain dimension in the engine's compiled
#: scans: cross-chain-adaptive kernels (e.g. ChEES-HMC) use
#: ``lax.pmean(..., CHAIN_AXIS)`` to share statistics across chains.
CHAIN_AXIS = "chains"


def _chunk_sizes(total: int, max_chunk: int) -> list:
    """Split ``total`` into near-equal chunks of at most ``max_chunk``.
    At most two distinct sizes come back, so at most two XLA programs
    compile per phase."""
    if total <= 0:
        return []
    n = -(-total // max_chunk)
    base = total // n
    rem = total - base * n
    return [base + 1] * rem + [base] * (n - rem)


#: default cap on device-resident kept-draw bytes before an early drain to
#: host (see _run_chunked); override with MAMBA_TPU_KEPT_BUFFER_BYTES.
_KEPT_BUFFER_BYTES = 2 * 1024**3


def _run_chunked(gibbs_iter, pack_monitored, carry, burnin, n_kept, thin,
                 *, meter=None, launch_iters=2000, max_live_bytes=None,
                 jit_cache=None):
    """Execute the warmup + sampling scans as a sequence of bounded device
    launches.

    One unbounded scan over all iterations is a single enormous XLA kernel;
    on tunneled/remote TPU runtimes long launches can exceed the transport's
    execution window (UNAVAILABLE device errors), and they also preclude any
    progress reporting.  Chunking costs one host sync per ~launch_iters raw
    Gibbs iterations — negligible — and reuses at most two compiled programs
    per phase (the reference instead loops per-iteration on the host,
    src/model/mcmc.jl:62-83).  ``meter`` is a ChainProgress updated per
    launch (reference wires its meter at mcmc.jl:73-80)."""
    import os
    if max_live_bytes is None:
        max_live_bytes = int(os.environ.get(
            "MAMBA_TPU_KEPT_BUFFER_BYTES", _KEPT_BUFFER_BYTES))
    # cross-call program cache (see _engine_cache): a repeat mcmc() on the
    # same (model, config) reuses the SAME jit-wrapped scan callables, so
    # the ~seconds of per-call retrace/relower vanish from the warm path
    # (r4 verdict #5: ~6 s of iteration-count-independent overhead)
    jitted = {} if jit_cache is None else jit_cache

    def warm_fn(length):
        """Row-free warmup program — only used for the burnin % thin
        remainder (phase_fn below covers whole-row chunks)."""
        if ("w", length) not in jitted:
            def warm_only(key, state, tunes):
                def warm(c, _):
                    key, state, tunes = c
                    return gibbs_iter(key, state, tunes,
                                      jnp.asarray(True)), None
                return jax.lax.scan(warm, (key, state, tunes),
                                    length=length)[0]
            jitted[("w", length)] = jax.jit(
                jax.vmap(warm_only, axis_name=CHAIN_AXIS))
        return jitted[("w", length)]

    def phase_fn(rows_n):
        """ONE program for both phases: ``adapt`` is a traced scalar input,
        so warmup chunks and kept chunks of the same row count share a
        single XLA compile (r4 verdict #6 — the separate warm/kept
        programs put two ~30 s compiles on the rats-bench cold path; the
        warm phase simply discards the emitted rows, and the dead
        adaptation arithmetic in the kept phase is a few elementwise
        passes over tune vectors, noise next to the leapfrog work)."""
        if ("p", rows_n) not in jitted:
            def chunk(key, state, tunes, adapt):
                def step(c, _):
                    if thin == 1:
                        # no inner scan at thin=1: scan->scan->while_loop is
                        # a three-deep loop nest, which the TPU compiler
                        # handles pathologically (see samplers/nuts.py
                        # doubling-unroll note)
                        c = gibbs_iter(*c, adapt)
                        return c, pack_monitored(c[1])
                    def inner(c2, _):
                        key, state, tunes = c2
                        return gibbs_iter(key, state, tunes, adapt), None
                    c, _ = jax.lax.scan(inner, c, length=thin)
                    return c, pack_monitored(c[1])
                (key, state, tunes), rows = jax.lax.scan(
                    step, (key, state, tunes), length=rows_n)
                return key, state, tunes, rows
            jitted[("p", rows_n)] = jax.jit(jax.vmap(
                chunk, axis_name=CHAIN_AXIS, in_axes=(0, 0, 0, None)))
        return jitted[("p", rows_n)]

    from ..utils.timing import device_sync

    def _to_host(r):
        if not getattr(r, "is_fully_addressable", True):
            # multi-host run: each process holds only its chain shard;
            # all-gather the monitored rows on device (reshard to fully
            # replicated) so every host returns the full Chains array (the
            # reference gathers worker results over the Distributed
            # channel, src/model/mcmc.jl:52-58)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(r.sharding.mesh, PartitionSpec())
            r = jax.jit(lambda a: a, out_shardings=rep)(r)
            r = r.addressable_data(0)
        return np.asarray(r)

    # Warmup runs through the SAME unified phase programs as the kept loop
    # (adapt=True, rows discarded), so by the time sampling starts its
    # programs are already compiled.  Only kept chunk sizes that no warm
    # chunk covers still need a compile — those are AOT-compiled on a
    # daemon thread WHILE warmup executes (tracing holds the GIL briefly;
    # the XLA compile itself releases it), keeping them off the cold
    # critical path.
    import threading

    kept_sizes = _chunk_sizes(n_kept, max(1, launch_iters // thin))
    warm_rows, warm_rem = divmod(burnin, thin)
    warm_chunks = _chunk_sizes(warm_rows, max(1, launch_iters // thin))
    aot: dict = {}
    carry0 = carry      # avals only; the warm loop rebinds `carry`
    adapt_off = jnp.asarray(False)

    def _precompile_kept():
        try:
            for rows_n in sorted(set(kept_sizes) - set(warm_chunks)):
                aot[rows_n] = phase_fn(rows_n).lower(
                    *carry0, adapt_off).compile()
        except Exception:       # fall back to the synchronous compile path
            aot.clear()

    def _single_device(tree):
        # AOT executables demand the exact input shardings they were
        # lowered with; on a mesh the warm scan's outputs come back with
        # GSPMD-chosen shardings that differ from the inits', so the
        # precompile only pays off (and is only safe to reuse) when
        # everything lives on one device.
        for l in jax.tree_util.tree_leaves(tree):
            devs = getattr(l, "devices", None)
            if devs is not None and len(devs()) > 1:
                return False
        return True

    pre = None
    missing = set(kept_sizes) - set(warm_chunks) - {
        n for n in kept_sizes if ("p", n) in jitted}
    if burnin and missing and _single_device(carry0):
        pre = threading.Thread(target=_precompile_kept, daemon=True)
        pre.start()

    t0 = time.time()
    adapt_on = jnp.asarray(True)
    for rw in warm_chunks:
        key_w, state_w, tunes_w, _rows = phase_fn(rw)(*carry, adapt_on)
        carry = (key_w, state_w, tunes_w)
        del _rows               # warmup rows are discarded
        if meter is not None:
            device_sync(carry[1])
            meter.update(rw * thin)
    if warm_rem:
        carry = warm_fn(warm_rem)(*carry)
    if pre is not None:
        pre.join()

    # Kept-draw chunks stay resident on device so sample_s can be split from
    # fetch_s, but residency is capped by a byte budget: a long run
    # monitoring large sites would otherwise accumulate chains*n_kept*npar
    # on-device and OOM mid-run (r3 advisor finding).  When the cap is hit,
    # completed chunks are drained to host early; the drain's transfer time
    # is excluded from sample_s and accumulated into fetch_s.
    device_pieces, host_pieces = [], []
    resident = 0
    fetch_acc = 0.0

    def drain():
        nonlocal resident, fetch_acc
        if not device_pieces:
            return
        device_sync(device_pieces[-1])  # compute barrier: sampling time
        tf = time.time()
        host_pieces.extend(_to_host(r) for r in device_pieces)
        fetch_acc += time.time() - tf
        device_pieces.clear()
        resident = 0

    for ck in kept_sizes:
        try:
            if ck in aot:
                key_f, state_f, tunes_f, r = aot[ck](*carry, adapt_off)
            else:
                raise KeyError(ck)
        except Exception:
            # ANY AOT-call failure (missing entry, donation/sharding/layout
            # mismatch surfacing as XlaRuntimeError, ...) degrades to the
            # always-safe synchronous jit path instead of aborting a long
            # sampling run mid-flight (r4 advisor)
            key_f, state_f, tunes_f, r = phase_fn(ck)(*carry, adapt_off)
        carry = (key_f, state_f, tunes_f)
        device_pieces.append(r)
        resident += int(np.prod(r.shape)) * r.dtype.itemsize
        if meter is not None:
            device_sync(r)
            meter.update(ck * thin)
        if resident > max_live_bytes:
            drain()
    # barrier on the final launch = all sampling compute has executed.
    # (block_until_ready is NOT a barrier on the tunneled TPU runtime —
    # utils/timing.py — so sample_s is synced by a scalar fetch instead.)
    if device_pieces:
        device_sync(device_pieces[-1])
    elif not host_pieces and burnin:
        device_sync(carry[1])
    sample_s = time.time() - t0 - fetch_acc

    # device->host transfer of the kept draws, reported separately: on the
    # tunnel this costs ~10 MB/s and would otherwise masquerade as sampling
    # time (the r02 "1024->4096-chain throughput regression" was exactly
    # this artifact)
    t0 = time.time()
    host_pieces.extend(_to_host(r) for r in device_pieces)
    rows = (np.concatenate(host_pieces, axis=1) if host_pieces
            else np.zeros((carry[0].shape[0], 0, 0)))
    fetch_s = fetch_acc + (time.time() - t0)
    return carry, rows, {"sample_s": sample_s, "fetch_s": fetch_s}


def _build_kernels(cm: CompiledModel):
    specs = cm.model.samplers
    if not specs:
        raise ValueError("model has no sampler blocks; call set_samplers first")
    return [s.build(cm) for s in specs]


def _cache_key(model, inputs, example_inits, thin, dtype, mesh, chain_axis,
               site_specs):
    """Cross-call engine-cache key: everything that changes the traced
    programs.  Input ARRAYS are content-hashed (they are baked into the
    compiled HLO as constants — an in-place mutation must miss); init
    values are not (they enter as runtime state), only their shapes."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    for k in sorted(inputs or {}):
        v = inputs[k]
        v = np.asarray(jax.device_get(v) if isinstance(v, jax.Array) else v)
        h.update(k.encode())
        h.update(repr((v.shape, str(v.dtype))).encode())
        h.update(np.ascontiguousarray(v).tobytes())
    shapes = tuple(sorted(
        (k, tuple(np.asarray(jax.device_get(v) if isinstance(v, jax.Array)
                             else v).shape))
        for k, v in example_inits.items()))
    mesh_key = (None if mesh is None
                else (id(mesh), chain_axis, repr(site_specs)))
    # the samplers tuple holds strong refs to the spec objects, so their
    # ids stay valid for the life of the cache entry
    return (tuple(model.samplers), thin, str(dtype), mesh_key,
            h.hexdigest(), shapes)


def mcmc(model_or_mc, inputs=None, inits=None, iters: int = 1000, *,
         burnin: int = 0, thin: int = 1, chains: int = 1, seed: int = 123,
         verbose: bool = True, progress: bool | None = None, dtype=None,
         mesh=None, chain_axis: str = "chains", site_specs=None,
         launch_iters: int = 2000) -> ModelChains:
    """``mcmc(model, inputs, inits, iters; burnin, thin, chains)`` — run —
    or ``mcmc(mc, iters)`` — restart (reference mcmc.jl:19-33 and 3-16).

    With ``mesh`` (a ``jax.sharding.Mesh`` with a ``chain_axis`` dimension),
    chain-stacked state is sharded over devices and the same compiled scan
    runs SPMD — the TPU-native replacement for the reference's
    process-parallel chains (mcmc.jl:36-59).  ``site_specs`` optionally maps
    site names to PartitionSpecs for their per-chain dims (shard a large
    observation axis over a mesh data axis)."""
    if isinstance(model_or_mc, ModelChains):
        return _mcmc_restart(model_or_mc, inputs if inputs is not None else iters)
    model = model_or_mc
    if not isinstance(model, Model):
        raise TypeError("first argument must be a Model or a ModelChains")
    if iters <= burnin:
        raise ValueError("iters must exceed burnin")

    # Pad-and-mask sharded axes: with a mesh + site_specs, any named array
    # (inputs or site inits) whose sharded dim doesn't divide the mesh axis
    # is edge-padded to the next multiple and — for stochastic sites — its
    # padded likelihood terms are masked to exactly zero, so arbitrary
    # observation counts shard cleanly (no divisibility requirement).
    masks = None
    if mesh is not None and site_specs:
        from ..parallel.mesh import pad_axes, pad_mask
        inputs, _ = pad_axes(mesh, site_specs, inputs or {})
        inits_list = inits if isinstance(inits, list) else [inits]
        padded, pads = [], {}
        for d in inits_list:
            pd, pads_d = pad_axes(mesh, site_specs, d)
            padded.append(pd)
            pads.update(pads_d)
        inits = padded
        if pads:
            stoch = set(model.keys("stochastic"))
            monitored = set(model.keys("monitor"))
            bad = sorted(set(pads) & stoch & monitored)
            if bad:
                raise ValueError(
                    f"sites {bad} are sharded on a non-divisible axis and "
                    f"monitored; set monitor=False (padded elements would "
                    f"appear in the output) or pad the data yourself")
            observed = set(model.keys("observed"))
            sampled_bad = sorted((set(pads) & stoch) - observed)
            if sampled_bad:
                # masked likelihood terms give padded coordinates exactly
                # zero gradient, so under HMC/NUTS momentum they random-walk
                # unboundedly and can overflow through constrained bijectors
                # (inf/NaN then poisons U-turn dot products for the real
                # coordinates).  Only observed (data) sites may be padded.
                raise ValueError(
                    f"sampled sites {sampled_bad} are sharded on a "
                    f"non-divisible mesh axis; pad-and-mask is only valid "
                    f"for observed data sites (padded sampled coordinates "
                    f"would drift unboundedly). Make the axis divisible or "
                    f"shard a different dimension.")
            masks = {n: pad_mask(np.asarray(padded[0][n]).shape, p)
                     for n, p in pads.items() if n in stoch}

    # Cross-call engine cache (r4 verdict #5): a repeat mcmc() with the
    # same model/config skips compile_model, kernel builds, AND the
    # re-trace of the scan programs (the jitted dict below) — measured
    # ~6 s of iteration-count-independent warm-path overhead at the rats
    # bench config, dominated by per-call retracing.  Entries hold the
    # sampler spec objects in their key, so changing set_samplers, inputs
    # (content-hashed), init shapes, thin, dtype or mesh misses cleanly.
    ex_inits = inits[0] if isinstance(inits, list) else inits
    ck = _cache_key(model, inputs, ex_inits, thin, dtype, mesh, chain_axis,
                    site_specs)
    cache = model.__dict__.setdefault("_engine_cache", {})
    ent = cache.get(ck)
    if ent is None:
        cm = compile_model(model, inputs, ex_inits, dtype=dtype, masks=masks)
        ent = {"cm": cm, "kernels": _build_kernels(cm), "jitted": {}}
        if len(cache) >= 4:             # bound retained executables
            cache.pop(next(iter(cache)))
        cache[ck] = ent
    cm, kernels = ent["cm"], ent["kernels"]
    state0 = _chain_inits(cm, inits, chains)
    keys = jax.jit(jax.vmap(lambda i: jax.random.fold_in(
        jax.random.key(seed), i)))(jnp.arange(chains))

    monitored, labels, pack_monitored = cm.monitor_spec()

    def init_tunes(key, state):
        return tuple(k.init(key, state) for k in kernels)

    def gibbs_iter(key, state, tunes, adapt):
        new_tunes = []
        for i, k in enumerate(kernels):
            key, sub = jax.random.split(key)
            state, t = k.step(sub, state, tunes[i], adapt)
            new_tunes.append(t)
        return key, state, tuple(new_tunes)

    n_kept = (iters - burnin) // thin

    # default-on ETA progress meter (reference default verbose=true shows
    # ChainProgress, mcmc.jl:44-51); launches are capped so the meter gets
    # at least ~10 updates
    progress = verbose if progress is None else progress
    meter = None
    if progress:
        from ..utils.progress import ChainProgress
        total = burnin + n_kept * thin
        meter = ChainProgress(total, chains=chains)
        launch_iters = max(1, min(launch_iters, -(-total // 10)))

    t_setup0 = time.time()
    if mesh is not None:
        from ..parallel.mesh import shard_chain_tree
        state0 = shard_chain_tree(state0, mesh, chains, chain_axis, site_specs)
        # rebuild the per-chain keys from a *sharded* index array instead of
        # distributing typed PRNG keys (whose backing data numpy can't see —
        # matters for multi-process meshes); fold_in gives identical streams
        # either way
        idx = shard_chain_tree(np.arange(chains), mesh, chains, chain_axis)
        keys = jax.jit(jax.vmap(lambda i: jax.random.fold_in(
            jax.random.key(seed), i)))(idx)
    tunes0 = jax.jit(jax.vmap(init_tunes, axis_name=CHAIN_AXIS))(keys, state0)
    if mesh is not None:
        from ..parallel.mesh import shard_chain_tree
        tunes0 = shard_chain_tree(tunes0, mesh, chains, chain_axis)
    # barrier: tune init (e.g. the vmapped nutsepsilon doubling search,
    # ~seconds at 1024 chains) is SETUP, not sampling — without this sync
    # its async-dispatched device time queues ahead of the first warm
    # chunk and lands inside sample_s as fixed overhead (r4 verdict #5).
    # keys ride along in the barrier tree: some tunes hold no array leaves
    # at all (BMC3/BMG index-set tunes), and the queue-drain sync then has
    # the PRNG keys to thread through (draining the queue covers the tune
    # init either way).
    from ..utils.timing import device_sync
    device_sync((keys, tunes0))
    setup_s = time.time() - t_setup0
    carry, rows, timing = _run_chunked(
        gibbs_iter, pack_monitored, (keys, state0, tunes0), burnin, n_kept,
        thin, meter=meter, launch_iters=launch_iters,
        jit_cache=ent["jitted"])
    key_f, state_f, tunes_f = carry
    timing["setup_s"] = setup_s
    if verbose:
        print(f"MCMC: {chains} chains x {iters} iterations "
              f"({burnin} burnin, thin {thin}) in {timing['sample_s']:.2f}s "
              f"({chains * iters / max(timing['sample_s'], 1e-9):,.0f} "
              f"chain-iters/s; draw fetch {timing['fetch_s']:.2f}s)")

    # rows: (chains, n_kept, npar) -> (n_kept, npar, chains)
    value = np.moveaxis(np.asarray(rows), 0, 2)
    return ModelChains(
        value, start=burnin + thin, thin=thin, names=labels,
        chains=list(range(1, chains + 1)), model=model, compiled=cm,
        states={"key": key_f, "state": state_f, "tunes": tunes_f,
                "burnin": burnin}, iter=burnin + n_kept * thin,
        timing=timing)


def _mcmc_restart(mc: ModelChains, iters: int) -> ModelChains:
    """Continue a run from its stored per-chain state (reference
    mcmc.jl:3-16): tune state, values and RNG keys carry over; the new
    draws are appended with a contiguous iteration range."""
    if mc.compiled is None or mc.states is None:
        raise ValueError("ModelChains lacks resume state")
    cm = mc.compiled
    kernels = _build_kernels(cm)
    _, labels, pack_monitored = cm.monitor_spec()
    thin = mc.thin
    n_kept = iters // thin
    if n_kept < 1:
        raise ValueError("iters too small for one kept sample at current thin")

    def gibbs_iter(key, state, tunes, adapt):
        new_tunes = []
        for i, k in enumerate(kernels):
            key, sub = jax.random.split(key)
            state, t = k.step(sub, state, tunes[i], adapt)
            new_tunes.append(t)
        return key, state, tuple(new_tunes)

    st = mc.states
    (key_f, state_f, tunes_f), rows, timing = _run_chunked(
        gibbs_iter, pack_monitored, (st["key"], st["state"], st["tunes"]),
        0, n_kept, thin)
    value = np.moveaxis(np.asarray(rows), 0, 2)
    new = ModelChains(
        value, start=mc.iter + thin, thin=thin, names=labels,
        chains=mc.chains, model=mc.model, compiled=cm,
        states={"key": key_f, "state": state_f, "tunes": tunes_f,
                "burnin": st["burnin"]}, iter=mc.iter + n_kept * thin,
        timing=timing)
    out = mc.cat_iters(new)
    out.states, out.iter, out.compiled, out.model = new.states, new.iter, cm, mc.model
    return out
