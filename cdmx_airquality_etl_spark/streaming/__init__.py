from .corpus_ingest import corpus_ingest_stream, dedup_batch_against_corpus
from .dedup import content_fingerprint, dedup_stream_within_watermark
from .drift import (
    batch_drift,
    category_profile,
    drift_monitor_stream,
    read_drift_log,
)
from .hygiene import decontaminate_batch, decontaminate_stream
from .index_maintenance import assign_cells, ivf_ingest_stream
from .kmv_maintenance import kmv_stream, read_kmv_estimate, read_sketch, update_sketch
from .ingest import ingest_stream
from .joins import dedup_within_watermark, interval_join
from .stateful import run_windowed_counts_stream, session_counts, windowed_counts
from .stateful_custom import run_running_totals_stream, running_totals

__all__ = [
    "content_fingerprint",
    "corpus_ingest_stream",
    "dedup_batch_against_corpus",
    "dedup_stream_within_watermark",
    "decontaminate_batch",
    "decontaminate_stream",
    "dedup_within_watermark",
    "assign_cells",
    "batch_drift",
    "category_profile",
    "drift_monitor_stream",
    "read_drift_log",
    "ingest_stream",
    "ivf_ingest_stream",
    "kmv_stream",
    "read_kmv_estimate",
    "read_sketch",
    "update_sketch",
    "interval_join",
    "run_running_totals_stream",
    "run_windowed_counts_stream",
    "running_totals",
    "session_counts",
    "windowed_counts",
]
