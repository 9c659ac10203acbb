from . import transforms, text, hashing

__all__ = ["transforms", "text", "hashing"]
