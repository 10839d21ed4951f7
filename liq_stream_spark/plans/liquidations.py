"""The liquidation-domain pipeline exposed through the driver contract.

These queries run the five venue normalizers over the replay fixtures
(tests/fixtures/*.jsonl, built from the reference's docstring samples) and
are registered rows-only (no SQL oracle): the wire-format explode/coalesce/
case-map semantics aren't ANSI-SQL-expressible over the pre-registered
views, and their correctness gate is the golden tests in
tests/test_normalizers.py instead.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.operators import (
    normalize_aster,
    normalize_binance,
    normalize_bybit,
    normalize_hyperliquid,
    normalize_okx,
)
from liq_stream_spark.plans import register
from liq_stream_spark.sources.replay import read_jsonl_frames

_FIXTURES = Path(__file__).resolve().parents[2] / "tests" / "fixtures"
_INGEST = 1_800_000_000_000  # pinned for determinism


def unified_liquidations(spark: SparkSession) -> DataFrame:
    """All five venues normalized and unioned — the reference's fan-in
    (stream.py:169-188) as one batch DataFrame."""
    binance = normalize_binance(
        read_jsonl_frames(spark, str(_FIXTURES / "binance_force_order.jsonl"), _INGEST)
    )
    aster = normalize_aster(
        read_jsonl_frames(spark, str(_FIXTURES / "binance_force_order.jsonl"), _INGEST)
    )
    bybit = normalize_bybit(
        read_jsonl_frames(spark, str(_FIXTURES / "bybit_liquidation.jsonl"), _INGEST)
    )
    okx = normalize_okx(
        read_jsonl_frames(spark, str(_FIXTURES / "okx_liquidation_orders.jsonl"), _INGEST)
    )
    hl = normalize_hyperliquid(
        read_jsonl_frames(spark, str(_FIXTURES / "hyperliquid_fills.jsonl"), _INGEST)
    )
    return (
        binance.unionByName(aster)
        .unionByName(bybit)
        .unionByName(okx)
        .unionByName(hl)
    )


@register(
    "liq_normalize_unified",
    None,
    doc="five venue normalizers + union into the unified schema "
    "(SURVEY.md §2.2-§2.3; golden-tested in tests/test_normalizers.py).",
)
def liq_normalize_unified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unified_liquidations(spark)


@register(
    "liq_venue_stats",
    None,
    doc="per-venue/side aggregate over the normalized union (console "
    "dashboard analogue of the reference's colored printer, K2).",
)
def liq_venue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    liq = unified_liquidations(spark)
    return (
        liq.groupBy("exchange", "market", "side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("notional").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_notional"),
        )
    )


@register(
    "liq_top_by_notional",
    None,
    doc="largest liquidations per venue (window top-k over the union) — "
    "the CHANGELOG's awk-dashboard analogue as a first-class query.",
)
def liq_top_by_notional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    liq = unified_liquidations(spark)
    w = W.partitionBy("exchange").orderBy(
        F.desc_nulls_last("notional"), F.asc("symbol"), F.asc("ts_exch_ms")
    )
    return (
        liq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "exchange", "symbol", "side", "qty", "price", "notional",
            "ts_exch_ms", F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "liq_hourly_by_symbol",
    None,
    doc="tumbling 1h event-time windows per symbol over the union — the "
    "streaming windowed-agg shape (q14) applied to the liquidation domain.",
)
def liq_hourly_by_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    liq = unified_liquidations(spark)
    hour = F.date_trunc("hour", F.timestamp_millis(F.col("ts_exch_ms")))
    return (
        liq.filter(F.col("ts_exch_ms").isNotNull())
        .groupBy(hour.alias("hour"), "exchange", "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_liqs"),
            F.sum(F.col("notional").cast("decimal(25,6)"))
            .cast("double")
            .alias("hourly_notional"),
            F.max("qty").alias("max_qty"),
        )
    )
