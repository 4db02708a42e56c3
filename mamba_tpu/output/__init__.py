"""Output / posterior-inference layer (reference src/output/)."""

from .chains import Chains, ModelChains
from .chainsummary import ChainSummary
from .stats import (autocor, autocov, changerate, cor, describe, hpd, mcse,
                    quantile, summarystats)

__all__ = [
    "Chains", "ModelChains", "ChainSummary",
    "autocor", "autocov", "changerate", "cor", "describe", "hpd", "mcse",
    "quantile", "summarystats",
]
