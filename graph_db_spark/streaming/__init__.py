"""Structured Streaming surface: the mutation feed and event-stream ops.

The reference's persistence pipeline is exactly a changelog stream
(SURVEY §2.10): WAL entries (Persistent/Log.hs:20-28) buffered through a
bounded queue (Util/IOQueue.hs:20-48) and applied in order. Here the WAL
directory is plain append-only parquet, so it doubles as a streaming
source; ``foreachBatch`` applies each micro-batch with the same
set-oriented ``apply_events`` used by batch commits.
"""

from graph_db_spark.streaming.apply import (
    load_published_snapshot,
    stream_apply_wal,
    stream_apply_wal_durable,
    stream_dedup_near,
    stream_dedup_near_banded,
    stream_dedup_near_banded_builtin,
    stream_dedup_vs_store,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)
from graph_db_spark.streaming.stateful import stateful_user_sessions

__all__ = [
    "stream_apply_wal",
    "stream_apply_wal_durable",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_near",
    "stream_dedup_near_banded",
    "stream_dedup_near_banded_builtin",
    "stream_dedup_vs_store",
    "load_published_snapshot",
    "stateful_user_sessions",
]
