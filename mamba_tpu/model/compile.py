"""Graph compiler: Model -> pure, jittable log-density / sampling functions.

This is the central design delta from the reference (SURVEY.md §7.1): where
Mamba.jl re-walks the DAG and re-evaluates node closures on every logpdf call
(src/model/simulation.jl:77-90) and differentiates by finite differences
(simulation.jl:47-51), we trace the DAG **once** into pure functions over an
immutable ``state`` dict (site name -> constrained value array) and get exact
gradients from JAX autodiff.  XLA's dead-code elimination performs the
reference's "params + downstream targets" block pruning automatically: each
block function sums only the relevant log-density terms, so untouched
subgraphs are never materialized in the compiled HLO.

Spaces: the canonical state holds *constrained* values (like the reference's
node values).  Each sampler block declares ``transform``: True means the
block's flat vector lives in unconstrained space with log-Jacobian terms
added for the block's own sites (reference transformdistribution.jl), False
means the flat vector is the raw constrained values with hard support
masking to -inf (reference distributionstruct.jl:138-140).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bijectors import Discrete
from ..utils.pytree import RavelSpec, elementwise_names, make_ravel_spec
from .model import Model
from .nodes import LogicalNode, StochasticNode


@dataclasses.dataclass(frozen=True)
class SiteSpec:
    """Static per-stochastic-site metadata resolved at compile time."""
    name: str
    shape: tuple[int, ...]
    unconstrained_shape: tuple[int, ...]
    discrete: bool
    observed: bool
    size: int
    unconstrained_size: int


class CompiledModel:
    """Compile-once representation of (Model, inputs, example inits).

    Inputs are closed over as constants (XLA constant-folds them); the
    dynamic state is a dict {site name -> constrained value array}.
    """

    def __init__(self, model: Model, inputs: dict[str, Any],
                 example_inits: dict[str, Any], dtype=None,
                 masks: dict[str, Any] | None = None):
        self.model = model
        self.dtype = dtype or jax.dtypes.canonicalize_dtype(np.float64)
        #: per-site likelihood masks (True = real observation).  Padded /
        #: masked-out entries contribute exactly 0 to every log density —
        #: this is how sharded observation axes support arbitrary (non-mesh-
        #: divisible) lengths: the engine pads the data and masks the tail.
        # HOST arrays, deliberately: inputs/masks only ever appear as
        # closed-over constants inside traced programs, where numpy bakes
        # in identically.  Eagerly uploading them would (a) commit the
        # shape-resolution probe below onto the accelerator (committed
        # operands override default_device) and (b) put device round-trips
        # on the compile path — measured minutes on a degraded remote-TPU
        # tunnel for kilobyte arrays.
        def _host(v):
            # one explicit transfer for device-resident user arrays (each
            # implicit np.asarray of a remote array is a separate fetch)
            return np.asarray(jax.device_get(v) if isinstance(v, jax.Array)
                              else v)

        self.masks = {k: _host(v).astype(bool)
                      for k, v in (masks or {}).items()}
        missing = model.input_names - set(inputs)
        if missing:
            raise ValueError(f"missing input values for {sorted(missing)}")
        self.inputs = {}
        for k, v in inputs.items():
            if k in model.input_names:
                h = _host(v)
                self.inputs[k] = h.astype(self._in_dtype(h))

        self.stochastic = model.keys("stochastic")
        self.logical = model.keys("logical")
        self.observed = set(model.keys("observed")) if model.samplers else set()

        # --- resolve shapes / bijectors with ONE jitted forward pass
        # (a remote TPU dispatches eager ops over a tunnel; op-by-op graph
        # evaluation here costs ~30s, a single compiled call ~2s) ----------
        # host arrays: the probe below runs on the CPU backend, so nothing
        # here should touch the accelerator
        state = {}
        for name in self.stochastic:
            if name not in example_inits:
                raise ValueError(f"no initial value for stochastic node {name!r}")
            state[name] = _host(example_inits[name]).astype(
                np.float64).astype(self.dtype)

        def _probe(state):
            env = self._eval_env(state)
            return env, {n: self._node_dist(n, env) for n in self.stochastic}

        # The probe only resolves shapes/bijector params/example values —
        # run it on the host CPU backend when one exists: compiling even
        # this tiny program against a remote-TPU tunnel costs ~30 s
        # (healthy) to minutes (degraded link), all of it avoidable.  The
        # resulting host arrays are baked into later TPU programs as
        # constants, so placement is irrelevant.
        try:
            probe_dev = jax.devices("cpu")[0]
        except RuntimeError:
            probe_dev = None
        if probe_dev is not None and jax.default_backend() != "cpu":
            with jax.default_device(probe_dev):
                env, dists = jax.jit(_probe)(state)
        else:
            env, dists = jax.jit(_probe)(state)
        #: concrete example distributions (for static support enumeration,
        #: missing-value masks, and bijector resolution)
        self.example_dists = dists
        self.example_values = {n: np.asarray(v) for n, v in env.items()}
        self.sites: dict[str, SiteSpec] = {}
        for name in self.stochastic:
            dist = dists[name]
            b = dist.bijector()
            shape = tuple(np.shape(env[name]))
            ushape = tuple(b.unconstrained_shape(shape))
            self.sites[name] = SiteSpec(
                name=name, shape=shape, unconstrained_shape=ushape,
                discrete=bool(getattr(dist, "is_discrete", False)),
                observed=name in self.observed,
                size=int(np.prod(shape, dtype=np.int64)) if shape else 1,
                unconstrained_size=int(np.prod(ushape, dtype=np.int64)) if ushape else 1,
            )
        # logical node shapes (for monitors)
        self.logical_shapes = {n: tuple(np.shape(env[n])) for n in self.logical}
        self._block_cache: dict = {}

    def _in_dtype(self, v):
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating):
            return self.dtype
        return a.dtype

    # ---- graph evaluation (the compile-once trace core) ---------------
    def _eval_env(self, state: dict) -> dict:
        """All node values: inputs + stochastic state + logicals in topo
        order.  Pure; called inside traces."""
        env = dict(self.inputs)
        env.update(state)
        for name in self.model.topo:
            node = self.model.nodes[name]
            if isinstance(node, LogicalNode):
                env[name] = node.fn(*[env[d] for d in node.deps])
        return env

    def _node_dist(self, name: str, env: dict):
        node = self.model.nodes[name]
        return node.fn(*[env[d] for d in node.deps])

    def node_dist(self, name: str, state: dict):
        """Distribution of a stochastic node given the current state."""
        return self._node_dist(name, self._eval_env(state))

    # ---- full log density ---------------------------------------------
    def _site_lp(self, name: str, dist, value, *, support_mask=True) -> jax.Array:
        """Total log density of one site, honoring an optional observation
        mask (padded entries contribute exactly 0, even if their padded
        values would be NaN/-inf)."""
        mask = self.masks.get(name)
        if mask is None:
            if support_mask:
                return dist.total_log_prob(value)
            return jnp.sum(dist.log_prob(value))
        lp = dist.log_prob(value)
        if support_mask:
            lp = jnp.where(dist.in_support(value), lp, -jnp.inf)
        if mask.ndim > lp.ndim:  # mask covers event dims: reduce with AND
            mask = jnp.all(mask, axis=tuple(range(lp.ndim, mask.ndim)))
        return jnp.sum(jnp.where(mask, lp, jnp.zeros_like(lp)))

    def logpdf(self, state: dict, terms: tuple[str, ...] | None = None) -> jax.Array:
        """Sum of stochastic log-densities (constrained space, no Jacobian).
        ``terms`` restricts to a subset (reference block logpdf,
        simulation.jl:54-58)."""
        env = self._eval_env(state)
        names = self.stochastic if terms is None else terms
        lp = jnp.asarray(0.0, self.dtype)
        for n in names:
            dist = self._node_dist(n, env)
            lp = lp + self._site_lp(n, dist, env[n])
        return lp

    def eval_logicals(self, state: dict) -> dict:
        """State extended with logical node values (for monitoring)."""
        env = self._eval_env(state)
        return {n: env[n] for n in list(self.stochastic) + list(self.logical)}

    # ---- block machinery ----------------------------------------------
    def block_terms(self, params: tuple[str, ...]) -> tuple[str, ...]:
        """Stochastic log-density terms affected by ``params``: the params
        themselves plus their stochastic targets (reference model.jl:185-205,
        gettargets pruning graph.jl:93-103)."""
        terms = list(params)
        for t in self.model.keys("target", list(params)):
            if isinstance(self.model.nodes.get(t), StochasticNode) and t not in terms:
                terms.append(t)
        order = {n: i for i, n in enumerate(self.model.topo)}
        return tuple(sorted(terms, key=order.__getitem__))

    def block_ravel_spec(self, params: tuple[str, ...], transform: bool) -> RavelSpec:
        shapes = {p: (self.sites[p].unconstrained_shape if transform
                      else self.sites[p].shape) for p in params}
        example = {p: np.zeros(s) for p, s in shapes.items()}
        return make_ravel_spec(example, dtype=self.dtype)

    def block_functions(self, params: tuple[str, ...], transform: bool,
                        prior_only: bool = False):
        """Returns (pack, unpack, logf):

        - ``pack(state) -> flat``          (reference unlist, simulation.jl:110-134)
        - ``unpack(flat, state) -> {p: value}``  (reference relist)
        - ``logf(flat, state) -> scalar``  (reference logpdf!, simulation.jl:77-90)

        With ``transform=True`` the flat vector is unconstrained and ``logf``
        includes the log-Jacobian of the block's own sites.
        """
        key = (tuple(params), bool(transform), bool(prior_only))
        if key in self._block_cache:
            return self._block_cache[key]
        params = tuple(params)
        # prior_only: just the params' own densities (+ Jacobians) — the ABC
        # sampler's logprior term (reference abc.jl:46, 105-107)
        terms = params if prior_only else self.block_terms(params)
        spec = self.block_ravel_spec(params, transform)
        pset = set(params)

        def pack(state):
            if not transform:
                return spec.ravel({p: state[p] for p in params})
            env = self._eval_env(state)
            packed = {}
            for p in params:
                b = self._node_dist(p, env).bijector()
                packed[p] = b.inverse(env[p])
            return spec.ravel(packed)

        def _decode(flat, state):
            """Walk topo order decoding block sites (whose bijectors may
            depend on parents) and recomputing intermediate logicals."""
            parts = spec.unravel(flat)
            env = dict(self.inputs)
            env.update({n: v for n, v in state.items() if n not in pset})
            logdet = jnp.asarray(0.0, self.dtype)
            dists = {}
            for name in self.model.topo:
                node = self.model.nodes[name]
                if isinstance(node, LogicalNode):
                    env[name] = node.fn(*[env[d] for d in node.deps])
                elif name in pset:
                    dist = node.fn(*[env[d] for d in node.deps])
                    dists[name] = dist
                    if transform:
                        b = dist.bijector()
                        u = parts[name]
                        env[name] = b.forward(u)
                        logdet = logdet + jnp.sum(b.event_log_det(u, max(dist.event_ndim, 0)))
                    else:
                        env[name] = parts[name]
                elif name in terms:
                    dists[name] = node.fn(*[env[d] for d in node.deps])
            return env, dists, logdet

        def unpack(flat, state):
            env, _, _ = _decode(flat, state)
            return {p: env[p] for p in params}

        def logf(flat, state):
            env, dists, logdet = _decode(flat, state)
            lp = logdet
            for n in terms:
                dist = dists[n]
                if transform and n in pset:
                    # in-support by construction; no masking (keeps autodiff clean)
                    lp = lp + self._site_lp(n, dist, env[n], support_mask=False)
                else:
                    lp = lp + self._site_lp(n, dist, env[n])
            if not transform:
                # Reference early -Inf exit (simulation.jl:77-90): when block
                # params leave their support, downstream terms may evaluate to
                # NaN (e.g. sqrt of a negative variance); the whole block
                # density is -inf, not NaN, so rejection loops terminate.
                lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
            return lp

        out = (pack, unpack, spec, logf)
        self._block_cache[key] = out
        return out

    # ---- forward (generative) sampling --------------------------------
    def forward_sample(self, key, state: dict, names=None) -> dict:
        """Draw the given stochastic nodes from their conditional priors in
        topo order (ancestral sampling).  Powers prior init, ABC simulation
        (reference abc.jl:55-68), MISS imputation (miss.jl:54-59) and
        posterior-predictive draws (modelstats.jl:71-102)."""
        if names is None:
            names = self.stochastic
        names = set(names)
        env = dict(self.inputs)
        env.update(state)
        out = dict(state)
        for name in self.model.topo:
            node = self.model.nodes[name]
            if isinstance(node, LogicalNode):
                env[name] = node.fn(*[env[d] for d in node.deps])
            elif name in names:
                dist = node.fn(*[env[d] for d in node.deps])
                key, sub = jax.random.split(key)
                val = jnp.asarray(dist.sample(sub), self.dtype)
                if self.sites:
                    target = tuple(self.sites[name].shape)
                    if val.shape != target:
                        # distribution batch smaller than the node (parameter
                        # recycling, e.g. iid Normal(0, s) over an array node):
                        # draw the missing lead dims iid, never copy one draw
                        lead = target[: len(target) - val.ndim]
                        val = jnp.asarray(dist.sample(sub, lead), self.dtype)
                        if val.shape != target:  # trailing broadcast recycling
                            val = jnp.broadcast_to(val, target)
                env[name] = out[name] = val
        return out

    # ---- monitoring ----------------------------------------------------
    def monitor_spec(self):
        """(names, flat element labels, pack fn) for monitored nodes.
        Labels follow the reference's ``beta[1]`` convention
        (src/variate.jl:76-88); nodes may monitor a subset of elements via
        1-based column-major index vectors (reference setmonitor!,
        dependent.jl:31-48)."""
        monitored = sorted(self.model.keys("monitor"))
        labels = []
        selections = []      # (name, shape, indices-or-None)
        for n in monitored:
            shape = (self.sites[n].shape if n in self.sites
                     else self.logical_shapes[n])
            size = int(np.prod(shape)) if shape else 1
            idx = self.model.nodes[n].monitor_indices(size)
            names_n = elementwise_names(n, shape)
            if idx is None:
                labels.extend(names_n)
            else:
                labels.extend(names_n[i] for i in idx)
            selections.append((n, shape, idx))

        def pack_monitored(state):
            vals = self.eval_logicals(state)
            # Julia column-major flatten for >1-d arrays
            flat = []
            for n, shape, idx in selections:
                v = vals[n]
                if v.ndim > 1:
                    v = jnp.reshape(jnp.transpose(v), (-1,))
                else:
                    v = jnp.reshape(v, (-1,))
                v = v.astype(self.dtype)
                if idx is not None:
                    v = v[jnp.asarray(idx)]
                flat.append(v)
            return jnp.concatenate(flat) if flat else jnp.zeros((0,), self.dtype)

        return tuple(monitored), labels, pack_monitored


def compile_model(model: Model, inputs: dict, inits: dict, dtype=None,
                  masks: dict | None = None) -> CompiledModel:
    return CompiledModel(model, inputs, inits, dtype=dtype, masks=masks)
