from .pytree import (RavelSpec, make_ravel_spec, tree_ravel_fn,
                     register_dataclass_pytree, elementwise_names)

__all__ = ["RavelSpec", "make_ravel_spec", "tree_ravel_fn",
           "register_dataclass_pytree", "elementwise_names"]
