"""Math utilities (reference src/utils.jl:45-81): logit/invlogit, running
means, and the Cramér-von Mises CDF (re-exported from diagnostics)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def invlogit(x):
    """1 / (1 + exp(-x)) (reference utils.jl:63-64)."""
    x = jnp.asarray(x)
    return 1.0 / (jnp.exp(-x) + 1.0)


def logit(x):
    """log(x / (1 - x)) (reference utils.jl:66-67)."""
    x = jnp.asarray(x)
    return jnp.log(x / (1.0 - x))


def cummean(x):
    """Running means over the leading axis (reference utils.jl:50-60)."""
    from ..output.stats import cummean_arr
    return cummean_arr(np.asarray(x))


def pcramer(q):
    from ..output.diagnostics import pcramer as _p
    return _p(q)
