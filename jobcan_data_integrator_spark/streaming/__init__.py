"""Structured Streaming mode (SURVEY.md §2.9): the reference's
batch-incremental state machine re-expressed as streams.

The reference has no true streaming, but its mechanisms map 1:1
(SURVEY.md §2.9 table): per-key watermarks -> event-time watermark;
late-data catch-up -> windowed aggregation with ``withWatermark``; the
work queue -> a file-source stream over the bronze archive; failure
records -> foreachBatch quarantine.  These entry points make the same
silver tables incrementally maintainable from a stream:

- ``stream_bronze_documents``  — tail the bronze archive as a stream
  (each appended JSON-lines file is a micro-batch; at scale this is the
  standard autoloader shape: file listing scales with new files only);
- ``merge_documents_stream``   — foreachBatch shred + MERGE into the
  silver store: exactly the batch pipeline's write path, so batch and
  streaming share one code path (and one idempotence contract);
- ``windowed_request_counts``  — event-time tumbling counts with a
  watermark bounding state;
- ``sessionize_events_stream`` — custom stateful operator via
  ``applyInPandasWithState`` (gap-based sessions per user), the
  reference-free example of state Spark lacks a built-in for.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from jobcan_data_integrator_spark.operators.shred import (
    parse_request_documents,
    shred_request_documents,
)
from jobcan_data_integrator_spark.storage import TableStore


def stream_bronze_documents(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """Tail the bronze detail archive (JSON lines) as a parsed doc stream."""
    raw = spark.readStream.format("text").load(bronze_dir)
    return parse_request_documents(raw, column="value")


def merge_documents_stream(
    docs: DataFrame,
    store: TableStore,
    checkpoint_dir: str,
    writes: dict[str, tuple[str, list[str]]] | None = None,
):
    """Incrementally maintain the silver tables from a document stream.

    ``foreachBatch`` reuses the batch merge path — the streaming mode is
    a scheduler over the same idempotent writes, so replays after a
    failure converge (same contract as the batch pipeline's re-run).
    """
    from jobcan_data_integrator_spark.pipeline import REQUEST_WRITES

    strategy = writes or REQUEST_WRITES

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            tables = shred_request_documents(batch_df)
            try:
                for name, df in tables.items():
                    kind, keys = strategy.get(name) or strategy["*"]
                    if kind == "upsert":
                        store.merge_upsert(name, df, keys)
                    else:
                        store.sync_children(name, df, keys)
            finally:
                # one cache set per micro-batch would otherwise accumulate
                tables.unpersist()

    return (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_request_counts(
    docs: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling counts per form with bounded state.

    The watermark is the streaming analogue of the reference's per-form
    ``applied_after`` cursor (I1): rows older than max(event_time) -
    watermark are finalized and their state dropped.
    """
    stamped = docs.select(
        F.col("doc.form_id").alias("form_id"),
        F.to_timestamp(F.col("doc.applied_date")).alias("applied_ts"),
    )
    return (
        stamped.withWatermark("applied_ts", watermark)
        .groupBy(F.window("applied_ts", window).alias("w"), "form_id")
        .agg(F.count("*").alias("n_requests"))
        .select(
            F.col("w.start").alias("window_start"),
            "form_id",
            "n_requests",
        )
    )


#: sessionize output: one row per closed-or-updated session.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_events_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    Input: streaming (user_id long, ts timestamp).  Keeps one open
    session per user in state; an event farther than ``gap_seconds`` from
    the session closes it (emitted) and opens a new one.  State is
    O(active users) — the ``applyInPandasWithState`` shape the reference's
    per-key progress map (I4) would take as a true stream.

    The open session of an idle user is flushed by an event-time timeout
    once the watermark passes ``session_end + gap`` — without it the last
    session of every user would sit in state forever and never be
    emitted in append mode.  Each batch runs a classic interval merge
    over (sorted events + the open session), so out-of-order events
    extend the open session backwards and stray chains before it form
    proper sessions.  State holds ONE open session (the latest); earlier
    sessions emit at batch end, which can close them before the
    watermark seals them — the error is bounded by the watermark delay,
    since anything older is dropped by Spark before reaching this
    operator.
    """
    from jobcan_data_integrator_spark.session import ensure_pyfiles

    ensure_pyfiles(events.sparkSession)
    gap_ms = gap_seconds * 1000
    events = events.withWatermark("ts", watermark)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def _emit(rows: list[tuple[int, int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_start": [pd.Timestamp(r[1], unit="ms") for r in rows],
                    "session_end": [pd.Timestamp(r[2], unit="ms") for r in rows],
                    "n_events": [r[3] for r in rows],
                }
            )

        if state.hasTimedOut:
            start_ms, end_ms, n_events = state.get
            state.remove()
            yield _emit([(user_id, start_ms, end_ms, n_events)])
            return

        # classic interval merge over (batch events + the open session),
        # sorted by start: this handles out-of-order events uniformly —
        # in-gap events extend the open session in either direction, and
        # stray chains wholly before it coalesce among THEMSELVES into
        # proper sessions instead of degenerating to singletons.
        intervals: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            intervals.extend(
                (t, t, 1)
                for t in (int(v.value // 1_000_000) for v in pdf["ts"])
            )
        if state.exists:
            intervals.append(tuple(state.get))
        intervals.sort()
        merged: list[list[int]] = []
        for s, e, n in intervals:
            if merged and s - merged[-1][1] <= gap_ms:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += n
            else:
                merged.append([s, e, n])
        *closed, open_sess = merged
        if closed:
            yield _emit([(user_id, s, e, n) for s, e, n in closed])
        state.update(tuple(open_sess))
        # flush once event time passes the open session's close point;
        # incoming rows satisfy t >= watermark, so this is always ahead
        # of the current watermark as the API requires
        state.setTimeoutTimestamp(open_sess[1] + gap_ms + 1)

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
