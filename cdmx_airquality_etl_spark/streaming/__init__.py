from .ingest import ingest_stream
from .stateful import run_windowed_counts_stream, windowed_counts

__all__ = ["ingest_stream", "run_windowed_counts_stream", "windowed_counts"]
