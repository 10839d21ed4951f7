"""Structured Streaming wiring: the reference's orchestrator re-expressed.

The reference runs one asyncio task per (exchange, market) pair feeding a
shared writer (stream.py:129-188). Here each venue is a streaming DataFrame
(file-replay source in dev, websocket Python Data Source live), normalized
by the SAME batch transform used in tests/oracles (batch/stream unification),
unioned, and written through one checkpointed foreachBatch fan-out (K1).

Dedup parity (ST1): the reference dedups ONLY Hyperliquid, keyed on
tid|liq_user|coin (hyperliquid_adapter.py:149-164) — node logs re-emit the
same fill in a new line wrapper after restarts/rollovers, so the key must
ignore the wrapper (local_time/block_*). The streaming variant is
``dropDuplicatesWithinWatermark`` on that exact key, applied to the HL
stream BEFORE the union; other venues are never deduped (two byte-identical
Binance events are two real liquidations). The watermark runs on INGEST
time: arrival-ordered like the ring, and nothing is ever dropped as late
(the reference never drops late data, SURVEY.md §2.7).

State at scale: watermark-bounded keyed state instead of the 50k LRU ring;
on a cluster use the RocksDB state store
(spark.sql.streaming.stateStore.providerClass) so state spills off-heap.

Delivery: checkpointing makes the pipeline at-least-once into every sink
and exactly-once into idempotent ones — a strict upgrade over the
reference's at-most-once, with identical observable row contents.
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
from liq_stream_spark.sources.hl_files import (
    HLTailRelay,
    read_hl_hourly_stream,
    read_hl_relay_stream,
)
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
    if not pairs:
        raise ValueError("need --all, --streams, or --exchange")

    out: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for ex, mk in pairs:
        if ex not in NORMALIZERS:
            raise ValueError(f"Unknown exchange: {ex}")
        if ex == "aster":
            mk = "usdt"  # guard (aster_adapter.py:30-31)
        if ex == "hyperliquid":
            mk = "usdc"  # guard (stream.py:118-120)
        if (ex, mk) in seen:
            # guard-collapsed or repeated specs (e.g. aster:usdt,aster:usdc
            # both map to aster:usdt) must not double-ingest every row
            continue
        seen.add((ex, mk))
        out.append((ex, mk))
    return out


def hl_dedup_within_watermark(
    liq_with_key: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """ST1 streaming variant: drop re-emitted Hyperliquid fills by the
    reference's key (tid|liq_user|coin, carried in ``_dedup_key``),
    bounded by an ingest-time watermark instead of the 50k ring."""
    withevent = liq_with_key.withColumn(
        "arrival_time", F.timestamp_millis(F.col("ts_ingest_ms"))
    )
    return (
        withevent.withWatermark("arrival_time", watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("arrival_time", "_dedup_key")
    )


def dedup_within_watermark(
    liq: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Opt-in whole-union dedup on the full row identity (NOT reference
    parity — the reference only dedups Hyperliquid; this exists for
    deployments that want idempotence against upstream replays of any
    venue). Ingest-time watermark for the same no-late-loss reason."""
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


def stream_venue(
    spark: SparkSession,
    exchange: str,
    market: str,
    source_dir: str | None = None,
    live: bool = False,
    max_files_per_trigger: int | None = None,
    hl_dedup_watermark: str | None = "10 minutes",
    **normalizer_kwargs,
) -> DataFrame:
    """One venue's streaming DataFrame: file replay (``source_dir``) or the
    live websocket data source (``live=True``). The SAME normalizer used in
    batch runs inside the stream; Hyperliquid additionally gets the
    watermark-bounded ST1 dedup on tid|liq_user|coin."""
    ws_options = normalizer_kwargs.get("ws_options", {})
    # sub-hour HL latency: when a relay dir is given, an HLTailRelay tails
    # the newest hour file under source_dir into it and the stream reads
    # the relay's append-only chunks instead of whole hour files (S8)
    hl_tail_relay_dir = normalizer_kwargs.get("hl_tail_relay_dir")
    hl_tail_catch_up = normalizer_kwargs.get("hl_tail_catch_up", True)
    # reference-parity COUNT-bounded dedup ring (hyperliquid_adapter.py:
    # 149-164): opt-in alternative to the time-bounded watermark default
    hl_dedup_ring_size = normalizer_kwargs.get("hl_dedup_ring_size")
    hl_dedup_ring_shards = normalizer_kwargs.get("hl_dedup_ring_shards", 1)
    normalizer_kwargs = {
        k: v
        for k, v in normalizer_kwargs.items()
        if k
        not in (
            "ws_options",
            "hl_tail_relay_dir",
            "hl_tail_catch_up",
            "hl_dedup_ring_size",
            "hl_dedup_ring_shards",
        )
    }
    relay = None
    if exchange == "hyperliquid" and hl_tail_relay_dir:
        relay = HLTailRelay(
            source_dir, hl_tail_relay_dir, catch_up=hl_tail_catch_up
        ).start()
        frames = read_hl_relay_stream(
            spark, hl_tail_relay_dir, max_files_per_trigger
        )
    elif live and exchange != "hyperliquid":
        from liq_stream_spark.sources import ws_datasource

        ws_datasource.register(spark)
        reader = (
            spark.readStream.format(ws_datasource.LiquidationWSDataSource.name())
            .option("venue", exchange)
            .option("market", market)
        )
        for k, v in ws_options.items():
            reader = reader.option(k, v)
        frames = reader.load()
    elif exchange == "hyperliquid":
        frames = read_hl_hourly_stream(spark, source_dir, max_files_per_trigger)
    else:
        frames = read_jsonl_frames_stream(spark, source_dir, max_files_per_trigger)

    if exchange == "hyperliquid":
        liq = normalize_hyperliquid(
            frames,
            market=market,
            dedup=False,  # batch dedup is global; streaming uses keyed state
            keep_dedup_key=bool(hl_dedup_watermark) or bool(hl_dedup_ring_size),
            **normalizer_kwargs,
        )
        if hl_dedup_ring_size:
            from liq_stream_spark.streaming.ring_dedup import ring_dedup

            liq = ring_dedup(
                liq,
                "_dedup_key",
                ring_size=hl_dedup_ring_size,
                n_groups=hl_dedup_ring_shards,
            ).drop("_dedup_key")
        elif hl_dedup_watermark:
            liq = hl_dedup_within_watermark(liq, hl_dedup_watermark)
        if relay is not None:
            liq._hl_relay = relay  # handle for caller-side stop()
        return liq
    return NORMALIZERS[exchange](frames, market=market, **normalizer_kwargs)


def run_pipeline(
    spark: SparkSession,
    pairs: list[tuple[str, str]],
    source_dirs: dict[tuple[str, str], str] | dict[str, str],
    sink_config: FanOutConfig,
    checkpoint_dir: str,
    trigger_seconds: float = 1.0,
    live: bool = False,
    hl_dedup_watermark: str | None = "10 minutes",
    union_dedup_watermark: str | None = None,
    max_files_per_trigger: int | None = None,
    normalizer_kwargs: dict[str, dict] | None = None,
    dashboard_console: bool = False,
    available_now: bool = False,
):
    """Build the unioned multi-venue stream and start ONE StreamingQuery
    (the reference's asyncio.gather of tasks -> one incrementalized plan;
    trigger interval ≙ the PG flush interval, ST4).

    ``available_now=True`` switches to the drain trigger: process every
    file already in the source dirs (checkpoint-aware, so only NEW files
    since the last run), then stop — the backfill/catch-up mode the
    reference has no analogue for. awaitTermination() returns when the
    backlog is drained; re-running after more files arrive drains just
    the delta.

    ``source_dirs`` is keyed by (exchange, market) pair — a venue streamed
    under two markets needs two directories (exchange-only keys are
    accepted for single-market setups and venues whose dir is shared)."""
    # Index-ingest ergonomics (VERDICT r12 item 4): any foreachBatch
    # body this pipeline drives that appends to an index root
    # (store.append_to_band_index / append_to_ivf_index) should wait
    # out a concurrent maintenance window instead of refusing fast.
    # Raise the process-level lock-wait default to ~2x the trigger —
    # bounded (one skipped-trigger's worth of catch-up, which the next
    # micro-batch absorbs), and an explicit kwarg or $LIQ_LOCK_WAIT_SEC
    # still wins over it.
    from liq_stream_spark import store

    store.set_default_lock_wait(2.0 * trigger_seconds)

    def dir_for(ex: str, mk: str) -> str | None:
        if live:
            if ex != "hyperliquid":
                return None  # websocket venues need no dir
            # HL "live" is file tailing, not a websocket — it REQUIRES
            # its root dir; falling through to a None dir would surface
            # as an opaque TypeError inside the reader
            if (ex, mk) not in source_dirs and ex not in source_dirs:
                raise KeyError(
                    f"hyperliquid live streaming tails hour files — "
                    f"configure a source dir for {(ex, mk)} (--hl-root)"
                )
        if (ex, mk) in source_dirs:
            return source_dirs[(ex, mk)]
        if ex in source_dirs:
            if sum(1 for e, _ in pairs if e == ex) > 1:
                raise ValueError(
                    f"{ex} streams under multiple markets; key source_dirs "
                    f"by (exchange, market) to avoid double-reading one dir"
                )
            return source_dirs[ex]
        raise KeyError(f"no source dir for {(ex, mk)}")

    kwargs = normalizer_kwargs or {}
    streams = [
        stream_venue(
            spark,
            ex,
            mk,
            source_dir=dir_for(ex, mk),
            live=live,
            max_files_per_trigger=max_files_per_trigger,
            hl_dedup_watermark=hl_dedup_watermark,
            **kwargs.get(ex, {}),
        )
        for ex, mk in pairs
    ]
    # harvest tail-relay handles BEFORE the union discards the per-venue
    # frames: the relays are daemon threads that outlive query.stop()
    # unless someone can reach them
    relays = [
        s._hl_relay for s in streams if getattr(s, "_hl_relay", None)
    ]
    unioned = streams[0]
    for s in streams[1:]:
        unioned = unioned.unionByName(s)
    if union_dedup_watermark:
        unioned = dedup_within_watermark(unioned, union_dedup_watermark)

    if dashboard_console:
        # the CHANGELOG's 6-hour dashboard as a SECOND StreamingQuery over
        # the same logical sources (update-mode console; windowed-agg state
        # is a handful of groups). Each query executes the source plan
        # independently — in live WS mode that means a second socket per
        # venue, so the CLI documents --dashboard as a replay/file-mode
        # feature first.
        from liq_stream_spark.streaming.dashboard import sixhour_dashboard

        dash_query = (
            sixhour_dashboard(unioned)
            .writeStream.format("console")
            .outputMode("update")
            .option("truncate", "false")
            .option(
                "checkpointLocation", checkpoint_dir.rstrip("/") + "_dashboard"
            )
            .trigger(
                **(
                    {"availableNow": True}
                    if available_now
                    else {"processingTime": f"{trigger_seconds} seconds"}
                )
            )
            .queryName("sixhour_dashboard")
            .start()
        )
        if available_now:
            # Drain mode self-terminates: the caller awaits only the main
            # query, so block here until the dashboard drains too —
            # otherwise process exit can kill it mid-flight.
            dash_query.awaitTermination()

    query = (
        unioned.writeStream.foreachBatch(fan_out(sink_config))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(
            **(
                {"availableNow": True}
                if available_now
                else {"processingTime": f"{trigger_seconds} seconds"}
            )
        )
        .start()
    )
    # expose the relay handles on the query so a long-lived driver can
    # stop the tail threads with the stream (the CLI does); without this
    # the handles are unreachable after the union and the 0.15 s pollers
    # run (and write chunk files) forever
    query._hl_relays = relays
    return query
