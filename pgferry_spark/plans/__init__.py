from .chunk import Chunk, ChunkPlan, chunk_key_for_table, plan_chunks
from .checkpoint import CheckpointManager, compatibility_fingerprint
from .validation import ValidationResult, validate_row_counts

__all__ = [
    "Chunk",
    "ChunkPlan",
    "chunk_key_for_table",
    "plan_chunks",
    "CheckpointManager",
    "compatibility_fingerprint",
    "ValidationResult",
    "validate_row_counts",
]
