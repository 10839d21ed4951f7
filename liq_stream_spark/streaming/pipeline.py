"""Structured Streaming wiring: the reference's orchestrator re-expressed.

The reference runs one asyncio task per (exchange, market) pair feeding a
shared writer (stream.py:129-188). Here each venue is a streaming DataFrame
(file-replay source in dev, websocket Python Data Source live), normalized
by the SAME batch transform used in tests/oracles (batch/stream unification),
unioned, optionally deduped within a watermark (ST1), and written through
one checkpointed foreachBatch fan-out (K1).

Delivery semantics: checkpointing makes the union at-least-once into every
sink and exactly-once into idempotent ones — a strict upgrade over the
reference's at-most-once (SURVEY.md §2.7), with identical observable row
contents.

State at scale: dropDuplicatesWithinWatermark bounds dedup state by TIME
(watermark horizon) instead of the reference's 50k-row LRU ring — on a
cluster, use the RocksDB state store
(spark.sql.streaming.stateStore.providerClass) so state spills off-heap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.operators import (
    normalize_aster,
    normalize_binance,
    normalize_bybit,
    normalize_hyperliquid,
    normalize_okx,
)
from liq_stream_spark.sinks import FanOutConfig, fan_out
from liq_stream_spark.sources.hl_files import read_hl_hourly_stream
from liq_stream_spark.sources.replay import read_jsonl_frames_stream

NORMALIZERS: dict[str, Callable[..., DataFrame]] = {
    "binance": normalize_binance,
    "aster": normalize_aster,
    "bybit": normalize_bybit,
    "okx": normalize_okx,
    "hyperliquid": normalize_hyperliquid,
}

ALL_STREAMS: list[tuple[str, str]] = [
    ("binance", "usdt"),
    ("binance", "coin"),
    ("bybit", "usdt"),
    ("bybit", "coin"),
    ("okx", "usdt"),
    ("okx", "coin"),
    ("aster", "usdt"),
    ("hyperliquid", "usdc"),
]


def resolve_streams(
    all_: bool = False,
    streams: str | None = None,
    exchange: str | None = None,
    market: str | None = None,
) -> list[tuple[str, str]]:
    """S9 multiplexer (stream.py:90-122): --all | --streams ex:mk,... |
    single --exchange/--market; per-venue market guards (Aster is
    USDT-only, Hyperliquid is USDC-only)."""
    if all_:
        return list(ALL_STREAMS)
    pairs: list[tuple[str, str]] = []
    if streams:
        for part in streams.split(","):
            part = part.strip()
            if not part:
                continue
            ex, _, mk = part.partition(":")
            pairs.append((ex.strip().lower(), (mk or "usdt").strip().lower()))
    elif exchange:
        pairs.append((exchange.lower(), (market or "usdt").lower()))
    else:
        raise ValueError("need --all, --streams, or --exchange")

    out: list[tuple[str, str]] = []
    for ex, mk in pairs:
        if ex not in NORMALIZERS:
            raise ValueError(f"Unknown exchange: {ex}")
        if ex == "aster":
            mk = "usdt"  # guard (aster_adapter.py:30-31)
        if ex == "hyperliquid":
            mk = "usdc"  # guard (stream.py:118-120)
        out.append((ex, mk))
    return out


def stream_venue(
    spark: SparkSession,
    exchange: str,
    market: str,
    source_dir: str,
    max_files_per_trigger: int | None = None,
    **normalizer_kwargs,
) -> DataFrame:
    """One venue's streaming DataFrame over a replay/live-relay directory.
    The SAME normalizer used in batch runs inside the stream — Structured
    Streaming's incrementalization handles the rest."""
    if exchange == "hyperliquid":
        frames = read_hl_hourly_stream(spark, source_dir, max_files_per_trigger)
        # batch-mode dedup is a global operator; in streaming it must be
        # the watermark-bounded stateful variant (applied on the union)
        return normalize_hyperliquid(
            frames, market=market, dedup=False, **normalizer_kwargs
        )
    frames = read_jsonl_frames_stream(spark, source_dir, max_files_per_trigger)
    return NORMALIZERS[exchange](frames, market=market, **normalizer_kwargs)


def dedup_within_watermark(
    liq: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """ST1 as a streaming operator: the reference's 50k-key LRU ring
    becomes time-bounded keyed state. Key = the raw identity available in
    the unified schema — for Hyperliquid this subsumes tid|user|coin
    because raw carries tid; semantic difference (count-bound vs
    time-bound) documented in SURVEY.md §7.4.

    The watermark runs on INGEST time, not event time, deliberately: the
    reference's ring is arrival-ordered (a dup is "seen recently", not
    "same event timestamp"), and an event-time watermark over the
    multi-venue union would let one venue's clock advance the global
    watermark and silently discard other venues' rows as late — the
    reference never drops late data (§2.7). Ingest time always moves
    forward, so nothing is ever late; the watermark solely bounds state."""
    withevent = liq.withColumn(
        "arrival_time", F.timestamp_millis(F.col("ts_ingest_ms"))
    )
    return (
        withevent.withWatermark("arrival_time", watermark)
        .dropDuplicatesWithinWatermark(
            ["exchange", "market", "symbol", "ts_exch_ms", "qty", "price", "raw"]
        )
        .drop("arrival_time")
    )


def run_pipeline(
    spark: SparkSession,
    pairs: list[tuple[str, str]],
    source_dirs: dict[str, str],
    sink_config: FanOutConfig,
    checkpoint_dir: str,
    trigger_seconds: float = 1.0,
    dedup_watermark: str | None = "10 minutes",
    max_files_per_trigger: int | None = None,
):
    """Build the unioned multi-venue stream and start ONE StreamingQuery
    (the reference's asyncio.gather of tasks -> one incrementalized plan;
    trigger interval ≙ the PG flush interval, ST4)."""
    streams = [
        stream_venue(
            spark, ex, mk, source_dirs[ex], max_files_per_trigger
        )
        for ex, mk in pairs
    ]
    unioned = streams[0]
    for s in streams[1:]:
        unioned = unioned.unionByName(s)
    if dedup_watermark:
        unioned = dedup_within_watermark(unioned, dedup_watermark)

    return (
        unioned.writeStream.foreachBatch(fan_out(sink_config))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
