from . import hashing, text, urls

__all__ = ["hashing", "text", "urls"]
