"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's server keeps per-connection transaction state in a command
loop (`library/GraphDB/Server.hs:17-69`); the Spark-native generalization
of "per-key mutable state evolved by an event stream" is
``applyInPandasWithState`` (Arrow-batched, grouped by key, state in the
state store with watermark-driven timeout). The operator here — a per-user
running aggregate with inactivity-timeout session flush — is the canonical
training-pipeline shape: sessionized usage rollups emitted as sessions
close rather than at query end.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterator[Any], state: GroupState
) -> Iterator[Any]:
    """Accumulate per-user counters; emit one row when the state times out
    (inactivity gap passed the watermark) — sessions close exactly once."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        n, s, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, n, s, first_us, last_us]],
            columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
        )
        return

    n, s, first_us, last_us = state.get if state.exists else (0, 0.0, None, None)
    for pdf in pdfs:
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        n += len(pdf)
        s += float(pdf["value"].sum())
        first_us = min([u for u in [first_us, *ts_us] if u is not None])
        last_us = max([u for u in [last_us, *ts_us] if u is not None])
    state.update((n, s, first_us, last_us))
    # Close the session 30 event-time minutes after the newest event.
    state.setTimeoutTimestamp(last_us // 1000 + 30 * 60 * 1000)
    yield from ()


def stateful_user_sessions(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user session rollups via applyInPandasWithState.

    ``events`` must be a *streaming* DataFrame with event-time ``ts``
    (timestamp), ``user_id``, ``value``. Output rows appear only when a
    user's inactivity gap crosses the watermark — the custom-stateful
    analogue of ``session_window`` with full Python control over the state
    transition (the piece built-in windows can't express, e.g. decaying
    counters or per-key model state).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- banded near-dup: per-bucket first-writer-wins claims ------------------

BUCKET_HIT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("band", IntegerType()),
    ]
)

BUCKET_STATE_SCHEMA = StructType(
    [
        StructField("claimant", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _make_bucket_claim_fn(horizon_ms: int):
    """Build the per-(band, bkey) state transition: the first arrival
    (min event time, doc_id tie-break — deterministic within a batch)
    CLAIMS the bucket; every later arrival from a different document is
    emitted as a hit row. State is one (claimant, last-activity) pair per
    live bucket and times out ``horizon_ms`` after the bucket's last
    activity — the same bound dropDuplicatesWithinWatermark puts on its
    key state, so banded dedup state stays watermark-bounded too."""

    import pandas as pd

    hit_cols = [f.name for f in BUCKET_HIT_SCHEMA.fields]

    def fn(key: tuple, pdfs: Iterator[Any], state: GroupState) -> Iterator[Any]:
        if state.hasTimedOut:
            state.remove()
            return
        band = int(key[0])
        # Per-group cost is the operator's scale floor (most buckets see
        # ONE row per batch: ~4 buckets/doc, few collisions), so the
        # common shape must not pay concat/sort/astype: concat only on
        # multiple chunks, sort only on multiple rows, and the max-ts
        # fold rides the claim loop (Timestamp.value = ns) instead of a
        # per-group astype('int64') column pass.
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        if len(rows) > 1:
            rows = rows.sort_values(["ts", "doc_id"])
        claimant, last_us = state.get if state.exists else (None, None)
        hits = []
        max_ns = 0
        for r in rows.itertuples():
            did = int(r.doc_id)
            ns = r.ts.value
            if ns > max_ns:
                max_ns = ns
            if claimant is None:
                claimant = did
            elif did != claimant:
                hits.append((did, r.ts, band))
        last_us = max(last_us or 0, max_ns // 1000)
        state.update((claimant, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + horizon_ms)
        if hits:
            yield pd.DataFrame(hits, columns=hit_cols)

    return fn


def stream_bucket_first_writer_hits(
    exploded: DataFrame, watermark: str, horizon_ms: int
) -> DataFrame:
    """Streaming LSH-bucket claims: *exploded* is a streaming frame of
    (doc_id, ts, band, bkey) band-key rows; the result is the HIT stream —
    one row per (arriving doc, band) whose bucket an earlier document
    already claimed within the horizon. A document is a near-duplicate
    (batch-LSH recall: shares ANY band with an earlier doc) iff it appears
    at least once in the hit stream."""
    return (
        exploded.withWatermark("ts", watermark)
        .groupBy("band", "bkey")
        .applyInPandasWithState(
            _make_bucket_claim_fn(horizon_ms),
            outputStructType=BUCKET_HIT_SCHEMA,
            stateStructType=BUCKET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
