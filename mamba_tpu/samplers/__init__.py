"""Sampler kernels (reference src/samplers/): each exposes stand-alone pure
functions ``<name>_init`` / ``<name>_step`` plus an engine-facing
``SamplerSpec`` subclass binding the kernel to a block of model nodes."""

from .base import BlockKernel, SamplerSpec, metropolis_accept, validate, validatebinary, validatesimplex
from .abc import ABC, ABCTune
from .custom import Gibbs
from .binary import (BHMC, BIA, BMC3, BMG, bhmc_init, bhmc_step, bia_init,
                     bia_step, bmc3_init, bmc3_step, bmg_init, bmg_step)
from .dgs import DGS, DGSTune, dgs_step, discrete_step
from .miss import MISS
from .slicesimplex import SliceSimplex, slicesimplex_init, slicesimplex_step
from .amm import AMM, amm_init, amm_step
from .chees import ChEESHMC, ChEESTune, chees_init, chees_step
from .amwg import AMWG, amwg_init, amwg_step
from .hmc import HMC, hmc_init, hmc_step
from .mala import MALA, mala_init, mala_step
from .nuts import NUTS, NUTSTune, nuts_init, nuts_step, nutsepsilon
from .rwm import RWM, rwm_init, rwm_step
from .slice import (Slice, slice_init, slice_multivariate_step,
                    slice_univariate_step)

__all__ = [
    "ChEESHMC", "ChEESTune", "chees_init", "chees_step",
    "BlockKernel", "SamplerSpec", "metropolis_accept",
    "ABC", "ABCTune", "Gibbs",
    "BHMC", "BIA", "BMC3", "BMG", "bhmc_init", "bhmc_step", "bia_init",
    "bia_step", "bmc3_init", "bmc3_step", "bmg_init", "bmg_step",
    "AMM", "amm_init", "amm_step",
    "DGS", "DGSTune", "dgs_step", "discrete_step", "MISS",
    "SliceSimplex", "slicesimplex_init", "slicesimplex_step",
    "validate", "validatebinary", "validatesimplex",
    "AMWG", "amwg_init", "amwg_step",
    "HMC", "hmc_init", "hmc_step",
    "MALA", "mala_init", "mala_step",
    "NUTS", "NUTSTune", "nuts_init", "nuts_step", "nutsepsilon",
    "RWM", "rwm_init", "rwm_step",
    "Slice", "slice_init", "slice_multivariate_step", "slice_univariate_step",
]
