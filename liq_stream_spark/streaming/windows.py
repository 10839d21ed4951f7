"""Watermarked event-time window aggregations over streams.

The reference aggregates nothing (SURVEY.md §2 — its only stateful ops
are dedup rings and batching buffers); these are the windowed rollups
its downstream dashboards recompute by hand today, expressed once so
the SAME operator runs over a live stream (append mode, watermark-gated
finalization) and over a batch backfill (Spark's
EliminateEventTimeWatermark erases the watermark and the plan collapses
to a plain groupBy window) — one definition, two execution modes, which
is what makes the batch oracle (sj03) a real gate on the streaming
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window aggregation.

    Groups rows into non-overlapping ``window``-sized event-time
    buckets (plus ``keys``) and applies ``aggs``. On a streaming input
    the watermark bounds state: a window's partial aggregate is held
    only until the watermark passes its end, then finalized (append
    mode) and dropped — state is O(active windows x key cardinality),
    never O(stream). On a batch input the same call is an ordinary
    map-side-combinable groupBy.

    Output flattens the window struct to (w_start, w_end) so batch
    oracles and sinks see plain timestamp columns."""
    agged = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("__w"), *(keys or []))
        .agg(*aggs)
    )
    rest = [c for c in agged.columns if c != "__w"]
    return agged.select(
        F.col("__w.start").alias("w_start"),
        F.col("__w.end").alias("w_end"),
        *rest,
    )


def session_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time session-window aggregation (gap-based): consecutive
    rows per key closer than ``gap`` merge into one session
    [first event, last event + gap).

    Streaming: sessions are mutable state until the watermark passes a
    session's end (a new event can extend or MERGE sessions), then
    finalize in append mode — Spark's native incarnation of the
    reference's dedup-ring-style keyed state, but with merge semantics
    no hand-rolled ring can express. Batch: the same call collapses to
    the q40 hash-agg plan, which is oracle-gated — so the batch leg
    proves the session semantics and the live test proves the
    watermark lifecycle.

    State is O(open sessions), bounded by watermark + gap."""
    agged = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("__w"), *(keys or [])
        )
        .agg(*aggs)
    )
    rest = [c for c in agged.columns if c != "__w"]
    return agged.select(
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *rest,
    )
