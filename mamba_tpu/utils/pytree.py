"""Pytree flatten/unflatten helpers.

TPU-native replacement for the reference's ``unlist``/``relist`` machinery
(reference: src/model/simulation.jl:110-163), which packs node values into a
flat Float64 vector by walking the graph per call.  Here the pack/unpack spec
is computed once at compile time and the runtime path is pure, jittable
reshape/concatenate — XLA fuses it away entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def register_dataclass_pytree(cls, static_fields: tuple[str, ...] = ()):
    """Register a (frozen) dataclass as a pytree node.

    ``static_fields`` become aux_data (hashable, not traced); everything else
    is a child.
    """
    fields = [f.name for f in dataclasses.fields(cls)]
    child_fields = tuple(f for f in fields if f not in static_fields)
    static = tuple(f for f in fields if f in static_fields)

    def flatten(obj):
        children = tuple(getattr(obj, f) for f in child_fields)
        aux = tuple(getattr(obj, f) for f in static)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(child_fields, children))
        kwargs.update(dict(zip(static, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass(frozen=True)
class RavelSpec:
    """Static spec for packing a dict of arrays into one flat vector."""

    names: tuple[str, ...]
    shapes: tuple[tuple[int, ...], ...]
    sizes: tuple[int, ...]
    offsets: tuple[int, ...]
    total: int
    dtype: Any

    def ravel(self, tree: dict[str, jax.Array]) -> jax.Array:
        if self.total == 0:
            return jnp.zeros((0,), self.dtype)
        parts = [jnp.reshape(tree[n], (-1,)).astype(self.dtype) for n in self.names]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def unravel(self, flat: jax.Array) -> dict[str, jax.Array]:
        out = {}
        for n, shape, size, off in zip(self.names, self.shapes, self.sizes, self.offsets):
            out[n] = jnp.reshape(jax.lax.dynamic_slice_in_dim(flat, off, size), shape)
        return out


def make_ravel_spec(example: dict[str, Any], dtype=None) -> RavelSpec:
    names = tuple(sorted(example.keys()))
    shapes = tuple(tuple(np.shape(example[n])) for n in names)
    sizes = tuple(int(np.prod(s, dtype=np.int64)) if s else 1 for s in shapes)
    offsets = tuple(int(x) for x in np.cumsum((0,) + sizes)[:-1])
    if dtype is None:
        dtype = jnp.result_type(*(jnp.asarray(example[n]).dtype for n in names)) if names else jnp.float32
    return RavelSpec(names=names, shapes=shapes, sizes=sizes,
                     offsets=offsets, total=int(sum(sizes)), dtype=dtype)


def elementwise_names(name: str, shape: tuple[int, ...]) -> list[str]:
    """Flat element names, reference-style: ``beta`` -> ``beta[1]``, ``beta[2]``;
    matrices -> ``S[1,1]`` … (column-major order to match the reference's
    Julia ``vec`` semantics; reference: src/variate.jl:76-88)."""
    if shape == ():
        return [name]
    # Julia vec() flattens column-major; 1-based indices.
    idx = np.indices(shape).reshape(len(shape), -1, order="F") + 1
    return [f"{name}[{','.join(str(i) for i in col)}]" for col in idx.T]


def tree_ravel_fn(example: dict[str, Any], dtype=None) -> tuple[Callable, Callable, RavelSpec]:
    spec = make_ravel_spec(example, dtype)
    return spec.ravel, spec.unravel, spec
