"""Streaming 6-hour dashboard — the reference CHANGELOG's awk dashboards
(CHANGELOG.md:12-14) as a live windowed aggregation over the unified
liquidation stream.

One transform serves both engines of the batch/stream unification: applied
to a batch DataFrame it reproduces ``liq_sixhour_dashboard`` (the oracled
driver query) exactly — ``F.window``'s 6-hour tumbling buckets align to
the epoch, the same boundaries as the batch query's integer epoch-ms floor
division — and applied to a streaming DataFrame it becomes an event-time
windowed aggregation with a watermark bounding state.

Scale notes: the aggregation keys are (window, exchange, market) — a few
dozen groups per 6 hours regardless of input volume, so state is tiny and
the shuffle carries partial aggregates (map-side combine). Decimal
accumulation keeps totals bit-identical between the streaming and batch
paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sixhour_dashboard(
    liq: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling 6h event-time dashboard per (exchange, market): liquidation
    counts, long/short breakdown, decimal-exact notional totals. Works on
    batch and streaming inputs; streaming inputs get an event-time
    watermark (late rows beyond it are dropped from their window — the
    standard streaming-completeness trade, NOT applied in batch)."""
    withevent = liq.filter(F.col("ts_exch_ms").isNotNull()).withColumn(
        "event_time", F.timestamp_millis(F.col("ts_exch_ms"))
    )
    if withevent.isStreaming:
        withevent = withevent.withWatermark("event_time", watermark)
    return (
        withevent.groupBy(
            F.window("event_time", "6 hours").alias("w"),
            "exchange",
            "market",
        )
        .agg(
            F.count(F.lit(1)).alias("n_liqs"),
            F.sum(F.when(F.col("side") == "long", 1).otherwise(0))
            .cast("long")
            .alias("n_long"),
            F.sum(F.when(F.col("side") == "short", 1).otherwise(0))
            .cast("long")
            .alias("n_short"),
            F.sum(F.col("notional").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_notional"),
            F.max("notional").alias("max_notional"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "exchange",
            "market",
            "n_liqs",
            "n_long",
            "n_short",
            "total_notional",
            "max_notional",
        )
    )
