"""Distribution kernel library (pure JAX, batched, pytree-registered)."""

from .base import (Distribution, UnivariateDistribution,
                   DiscreteUnivariateDistribution, distribution)
from .univariate import (Normal, LogNormal, Exponential, Gamma, InverseGamma,
                         Beta, Uniform, Cauchy, Laplace, Logistic, TDist,
                         Chisq, Weibull, Pareto, Gumbel, Flat, SymUniform,
                         Truncated)
from .discrete import (Bernoulli, Binomial, Poisson, Geometric,
                       NegativeBinomial, Categorical, DiscreteUniform,
                       Hypergeometric)
from .mixed import Blockwise, Mixed
from .multivariate import (MvNormal, MvNormalIso, MvNormalDiag, MvNormalFull,
                           MvNormalCanon, MvTDist, Dirichlet, Multinomial,
                           BDiagNormal, Wishart, InverseWishart)

__all__ = [
    "Distribution", "UnivariateDistribution", "DiscreteUnivariateDistribution",
    "distribution",
    "Normal", "LogNormal", "Exponential", "Gamma", "InverseGamma", "Beta",
    "Uniform", "Cauchy", "Laplace", "Logistic", "TDist", "Chisq", "Weibull",
    "Pareto", "Gumbel", "Flat", "SymUniform", "Truncated",
    "Bernoulli", "Binomial", "Poisson", "Geometric", "NegativeBinomial",
    "Categorical", "DiscreteUniform", "Hypergeometric",
    "MvNormal", "MvNormalIso", "MvNormalDiag", "MvNormalFull", "MvNormalCanon",
    "Mixed", "Blockwise",
    "MvTDist", "Dirichlet", "Multinomial", "BDiagNormal", "Wishart",
    "InverseWishart",
]
