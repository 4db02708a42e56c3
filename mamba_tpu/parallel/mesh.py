"""Device-mesh helpers for chain-parallel (+ data-parallel) MCMC.

Replaces the reference's process-based ``pmap2`` chain fan-out
(src/utils.jl:91-98, src/model/mcmc.jl:36-59) with sharded device arrays:
chain-stacked state pytrees get a ``NamedSharding`` over the mesh's chain
axis and the jitted scan partitions automatically (single-controller SPMD;
collectives ride ICI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """``make_mesh({'chains': 4, 'data': 2})``.  With no spec, a 1-D
    ``chains`` mesh over all devices."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"chains": len(devices)}
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {axes} needs {int(np.prod(shape))} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes.keys()))


def chain_sharding(mesh: Mesh, chain_axis: str = "chains",
                   site_spec: P | None = None) -> NamedSharding:
    """Sharding for a chain-stacked array: leading dim over the mesh chain
    axis, trailing dims per ``site_spec`` (e.g. P('data') to shard a big
    observation axis — the sequence-parallel analog)."""
    extra = tuple(site_spec) if site_spec is not None else ()
    return NamedSharding(mesh, P(chain_axis, *extra))


def shard_chain_tree(tree, mesh: Mesh, nchains: int,
                     chain_axis: str = "chains",
                     site_specs: dict | None = None):
    """device_put a chain-stacked pytree with leading-dim chain sharding.

    Leaves whose leading dim equals ``nchains`` are sharded over the mesh
    chain axis; anything else (static ints, unbatched constants) is
    replicated.  ``site_specs`` maps state-dict keys to PartitionSpecs for
    their per-chain (trailing) dims, e.g. ``{'y': P('data')}`` to shard a
    large observation axis.
    """
    site_specs = site_specs or {}
    multiproc = any(d.process_index != jax.process_index()
                    for d in mesh.devices.flat)

    def to_sharding(x, sharding):
        if multiproc:
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a global array (output of a sharded jit)
            # every process holds the same full host value (inits/indices are
            # computed identically everywhere); passing global_shape ==
            # local shape tells JAX the host data is replicated, so each
            # process takes just its own shards of it
            a = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sharding, a, global_shape=a.shape)
        return jax.device_put(x, sharding)

    def put(path, x):
        shape = np.shape(x)
        if not shape or shape[0] != nchains:
            return to_sharding(x, NamedSharding(mesh, P()))
        name = path[-1].key if path and hasattr(path[-1], "key") else None
        spec = site_specs.get(name)
        if spec is not None and len(tuple(spec)) > len(shape) - 1:
            raise ValueError(f"site spec {spec} too long for shape {shape}")
        return to_sharding(x, chain_sharding(mesh, chain_axis, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def _spec_divisor(mesh: Mesh, entry) -> int:
    """Number of shards a PartitionSpec entry implies (str or tuple)."""
    if entry is None:
        return 1
    names = (entry,) if isinstance(entry, str) else tuple(entry)
    d = 1
    for n in names:
        d *= mesh.shape[n]
    return d


def pad_axes(mesh: Mesh, site_specs: dict, arrays: dict,
             mode: str = "edge"):
    """Pad arrays named in ``site_specs`` so every sharded dim is divisible
    by its mesh-axis size (GSPMD/device_put require even partitions).

    Specs index the array's own dims: ``{'y': P('data')}`` shards y's dim 0,
    ``{'xmat': P('data', None)}`` shards xmat's dim 0.  Padding repeats edge
    values (keeps padded entries inside the distribution's support); the
    engine masks their likelihood terms to exactly zero, so any observation
    count works on any mesh (no divisibility requirement for the user).

    Returns ``(padded_arrays, pads)`` where ``pads[name][dim] = (orig, new)``
    for every dim actually padded.
    """
    out = dict(arrays)
    pads: dict[str, dict[int, tuple[int, int]]] = {}
    for name, spec in site_specs.items():
        if name not in arrays:
            continue
        a = np.asarray(arrays[name])
        widths = [(0, 0)] * a.ndim
        info = {}
        for dim, entry in enumerate(tuple(spec)):
            div = _spec_divisor(mesh, entry)
            if div <= 1:
                continue
            if dim >= a.ndim:
                raise ValueError(
                    f"site spec {spec} for {name!r} names dim {dim} but the "
                    f"array has shape {a.shape}")
            new = -(-a.shape[dim] // div) * div
            if new != a.shape[dim]:
                widths[dim] = (0, new - a.shape[dim])
                info[dim] = (a.shape[dim], new)
        if info:
            out[name] = np.pad(a, widths, mode=mode)
            pads[name] = info
    return out, pads


def pad_mask(shape: tuple, pads: dict[int, tuple[int, int]]) -> np.ndarray:
    """Boolean mask over ``shape``: True for real entries, False for the
    padded tail of each padded dim."""
    mask = np.ones(shape, dtype=bool)
    for dim, (orig, _new) in pads.items():
        idx = [slice(None)] * len(shape)
        idx[dim] = slice(orig, None)
        mask[tuple(idx)] = False
    return mask


def distributed_init(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: one controller process per host over ICI/DCN
    (TPU-native stand-in for the reference's user-launched Julia workers,
    ``julia -p N`` + pmap, src/utils.jl:91-98).  Arguments default to the
    TPU pod-slice environment (auto-detected by jax.distributed); call once
    before building a mesh spanning hosts.  No-op if already initialized."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(axes: dict[str, int] | None = None) -> Mesh:
    """Mesh over all devices of all participating processes (call after
    ``distributed_init`` on every host)."""
    devices = jax.devices()
    if axes is None:
        axes = {"chains": len(devices)}
    return make_mesh(axes, devices)
