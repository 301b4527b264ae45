"""Structured Streaming surface (SURVEY.md §2.10).

The reference is strictly batch (one-shot CLI, ``Program.cs:18-57``);
these are the engine's streaming extensions over the same event schema,
each the streaming twin of a batch query in queries/events.py.
"""

from dataingestionplayground_spark.streaming.windows import (
    stream_tumbling_counts,
    stream_sliding_counts,
    stream_session_windows,
    stream_dedup_within_watermark,
    stream_stateful_running_max,
    stream_running_stats_tws,
    stream_stream_interval_join,
)
from dataingestionplayground_spark.streaming.ingest import stream_ingest_markdown
from dataingestionplayground_spark.streaming.documents import (
    stream_quality_scores,
    stream_pack_sequences,
    stream_decontaminate,
)

__all__ = [
    "stream_quality_scores",
    "stream_pack_sequences",
    "stream_decontaminate",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_within_watermark",
    "stream_stateful_running_max",
    "stream_running_stats_tws",
    "stream_stream_interval_join",
    "stream_ingest_markdown",
]
