"""Additional inference backends beyond MCMC (BASELINE.json north star):

- ``advi``: automatic differentiation variational inference — mean-field
  Gaussian in the model's link-transformed space; used stand-alone or as an
  MCMC warm-start.
- ``smc``: likelihood-tempered sequential Monte Carlo with systematic
  resampling; particles are a vmap axis shardable over a device mesh (the
  resampling gather is XLA-collective-friendly).

The reference has neither — its only inference engine is Gibbs MCMC; these
are the TPU-native additions its BASELINE configs call for.
"""

from .advi import ADVIResult, advi
from .smc import SMCResult, smc

__all__ = ["advi", "ADVIResult", "smc", "SMCResult"]
