"""Example model zoo (reference doc/tutorial + doc/examples BUGS volumes).

Each module exposes ``build() -> (model, inputs, inits)`` with the
reference's sampling scheme pre-assigned, so
``mcmc(*prepend_model(build()), ...)`` reproduces the published golden
posterior tables (BASELINE.md)."""

from . import (asthma, birats, blocker, bones, dogs, dyes, epil, equiv, eyes,
               gk, glmm, inhalers, jaws, kidney, leuk, line, line_abc, lsat,
               magnesium, mice, oxford, pollution, pumps, rats, salm, seeds,
               stacks, surgical)

__all__ = ["asthma", "birats", "blocker", "bones", "dogs", "dyes", "epil",
           "equiv", "eyes", "gk", "glmm", "inhalers", "jaws", "kidney",
           "leuk", "line", "line_abc", "lsat", "magnesium", "mice", "oxford",
           "pollution", "pumps", "rats", "salm", "seeds", "stacks",
           "surgical"]
