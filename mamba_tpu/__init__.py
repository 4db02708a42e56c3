"""mamba_tpu: a TPU-native probabilistic-programming / MCMC framework.

A from-scratch JAX/XLA rebuild of the capability surface of Mamba.jl
(reference mounted at /root/reference): DAG-based hierarchical model
specification, block-wise Gibbs sampling with pluggable sampler kernels,
vectorized parallel chains, and a full posterior-inference/diagnostics
toolkit — redesigned around compile-once log-densities, autodiff gradients,
`lax.scan` iteration, `vmap`-ed chains and mesh-sharded scale-out instead of
the reference's interpreted graph walks and process-based parallelism.
"""

from .ops import bijectors
from .ops.distributions import *  # noqa: F401,F403
from .ops import distributions as dists
from .model.nodes import Logical, Stochastic
from .model.model import Model
from .model.compile import CompiledModel, compile_model
from .model.mcmc import mcmc
from . import samplers
from .samplers import (ABC, AMM, AMWG, BHMC, BIA, BMC3, BMG, DGS, HMC, MALA,
                       MISS, NUTS, RWM, Slice, SliceSimplex)
from . import models
from . import infer
from .utils.math import cummean, invlogit, logit
from . import maxpost
from .infer import advi, smc
from .maxpost import optim_over
from . import output
from .output import (Chains, ModelChains, ChainSummary, autocor, changerate,
                     cor, describe, dic, gelmandiag, gewekediag, heideldiag,
                     hpd, logpdf_chains, mcse, predict, quantile, rafterydiag,
                     plot, draw, read_chains, readcoda, summarystats, write_chains)

__version__ = "0.1.0"
