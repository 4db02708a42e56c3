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

__version__ = "0.1.0"
