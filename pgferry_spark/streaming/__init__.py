from .events import hourly_event_counts, stream_events_from_parquet

__all__ = ["hourly_event_counts", "stream_events_from_parquet"]
