from . import dedup, orphans, queries, similarity

__all__ = ["dedup", "orphans", "queries", "similarity"]
