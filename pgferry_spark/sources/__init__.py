from .parquet import chunked_parquet_read, load_tables

__all__ = ["chunked_parquet_read", "load_tables"]
