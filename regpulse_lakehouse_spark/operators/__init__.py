from . import dedup, vector

__all__ = ["dedup", "vector"]
