"""mamba_tpu: a TPU-native probabilistic-programming / MCMC framework.

A from-scratch JAX/XLA rebuild of the capability surface of Mamba.jl
(reference mounted at /root/reference): DAG-based hierarchical model
specification, block-wise Gibbs sampling with pluggable sampler kernels,
vectorized parallel chains, and a full posterior-inference/diagnostics
toolkit — redesigned around compile-once log-densities, autodiff gradients,
`lax.scan` iteration, `vmap`-ed chains and mesh-sharded scale-out instead of
the reference's interpreted graph walks and process-based parallelism.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the big NUTS/engine programs take
# minutes to compile against a remote TPU but single-digit seconds to load
# from cache (measured 322s -> 14s).  Opt out with MAMBA_TPU_NO_CACHE=1 or
# by setting jax_compilation_cache_dir yourself first.
def _cpu_backend() -> bool:
    # avoid initializing the backend just to check; env/config suffice
    cfg = getattr(_jax.config, "jax_platforms", None) or \
        _os.environ.get("JAX_PLATFORMS", "")
    return str(cfg).split(",")[0].strip() == "cpu"


if not _os.environ.get("MAMBA_TPU_NO_CACHE"):
    # TPU only: CPU executables may be AOT-compiled on a different machine
    # (remote-compile setups), and loading them across CPU feature sets is
    # unsafe.
    if _jax.config.jax_compilation_cache_dir is None and not _cpu_backend():
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/mamba_tpu_xla"))
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .ops import bijectors
from .ops.distributions import *  # noqa: F401,F403
from .ops import distributions as dists
from .model.nodes import Logical, Stochastic
from .model.model import Model
from .model.compile import CompiledModel, compile_model
from .model.mcmc import mcmc
from . import samplers
from .samplers import (ABC, AMM, AMWG, BHMC, BIA, BMC3, BMG, ChEESHMC, DGS,
                       Gibbs, HMC, MALA, MISS, NUTS, RWM, Slice, SliceSimplex)
from . import models
from . import infer
from .utils.math import cummean, invlogit, logit
from . import maxpost
from .infer import advi, smc
from .maxpost import optim_over
from . import output
from .output import (Chains, ModelChains, ChainSummary, autocor, changerate,
                     cor, describe, dic, ess_bulk, ess_rhat, ess_tail,
                     gelmandiag, gewekediag, heideldiag,
                     hpd, logpdf_chains, mcse, predict, quantile, rafterydiag,
                     rhat_rank, plot, draw, read_chains, readcoda,
                     summarystats, write_chains)

__version__ = "0.1.0"
