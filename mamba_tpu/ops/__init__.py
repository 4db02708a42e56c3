from . import bijectors, distributions

__all__ = ["bijectors", "distributions"]
