from .pytree import (RavelSpec, make_ravel_spec, tree_ravel_fn,
                     register_dataclass_pytree, elementwise_names)
from . import profiling

__all__ = ["RavelSpec", "make_ravel_spec", "tree_ravel_fn",
           "register_dataclass_pytree", "elementwise_names", "profiling"]
