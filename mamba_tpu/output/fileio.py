"""Chains persistence + BUGS/CODA import.

TPU-native counterpart of reference src/output/fileio.jl.  The reference
Julia-serializes whole ModelChains including closures (fileio.jl:3-11);
Python lambdas don't pickle, so the split here is explicit: ``write_chains``
persists draws + per-chain resume pytrees (numpy-materialized), and
``read_chains`` optionally re-binds a user-reconstructed Model to restore
restartability — the same information the reference's ModelState snapshots
carry (src/Mamba.jl:152-155).
"""

from __future__ import annotations

import pickle

import numpy as np

from .chains import Chains, ModelChains


def write_chains(path: str, c: Chains) -> None:
    """Persist a Chains/ModelChains (draws, range, names, resume state —
    not the model object itself)."""
    payload = {
        "value": np.asarray(c.value), "start": c.start, "thin": c.thin,
        "names": c.names, "chains": c.chains,
    }
    if isinstance(c, ModelChains):
        payload["iter"] = c.iter
        if c.states is not None:
            import jax

            def tonumpy(x):
                if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                        x.dtype, jax.dtypes.prng_key):
                    return np.asarray(jax.random.key_data(x))
                return np.asarray(x)

            payload["states"] = jax.tree.map(tonumpy, c.states)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def read_chains(path: str, model=None, inputs=None, dtype=None):
    """Load chains written by ``write_chains``.  Pass the Model (and its
    inputs) to get a restartable ModelChains back; otherwise a plain
    Chains."""
    with open(path, "rb") as f:
        p = pickle.load(f)
    if model is None:
        return Chains(p["value"], start=p["start"], thin=p["thin"],
                      names=p["names"], chains=p["chains"])
    from ..model.compile import compile_model
    states = p.get("states")
    cm = None
    if states is not None:
        import jax
        import jax.numpy as jnp
        example = {k: np.asarray(v)[0] for k, v in states["state"].items()}
        cm = compile_model(model, inputs, example, dtype=dtype)
        states = jax.tree.map(jnp.asarray, states)
        # raw uint32 key-data round-trips through numpy; rewrap
        states["key"] = jax.random.wrap_key_data(np.asarray(states["key"]))
    return ModelChains(p["value"], start=p["start"], thin=p["thin"],
                       names=p["names"], chains=p["chains"], model=model,
                       compiled=cm, states=states, iter=p.get("iter"))


def readcoda(output_file: str, index_file: str) -> Chains:
    """Import BUGS CODA output/index files (reference fileio.jl:14-37)."""
    out = np.loadtxt(output_file)
    names, first_ind, last_ind = [], [], []
    with open(index_file) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            names.append(parts[0])
            first_ind.append(int(parts[1]))
            last_ind.append(int(parts[2]))
    first_ind = np.asarray(first_ind)
    last_ind = np.asarray(last_ind)
    firstiter = out[first_ind - 1, 0].astype(int)
    lastiter = out[last_ind - 1, 0].astype(int)
    thin = int((lastiter[0] - firstiter[0]) / (last_ind[0] - first_ind[0]))
    lo, hi = firstiter.max(), lastiter.min()
    window = np.arange(lo, hi + 1, thin)
    startind = first_ind + (window[0] - firstiter) // thin
    stopind = last_ind - (lastiter - window[-1]) // thin
    value = np.empty((len(window), len(names)))
    for i in range(len(names)):
        value[:, i] = out[startind[i] - 1: stopind[i], 1]
    return Chains(value, start=int(window[0]), thin=thin, names=names)
