"""Example model zoo (reference doc/tutorial + doc/examples BUGS volumes).

Each module exposes ``build() -> (model, inputs, inits)`` with the
reference's sampling scheme pre-assigned, so
``mcmc(*prepend_model(build()), ...)`` reproduces the published golden
posterior tables (BASELINE.md)."""

from . import eyes, line, rats, seeds

__all__ = ["eyes", "line", "rats", "seeds"]
