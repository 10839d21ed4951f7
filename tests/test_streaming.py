"""Streaming semantics tests (SURVEY.md §5.3): the SAME normalizers under
Structured Streaming — file-drop micro-batches, watermarked dedup across
batches, checkpoint restart idempotence, and the partitioned sink layout."""

import json
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from liq_stream_spark.sinks import FanOutConfig
from liq_stream_spark.streaming.pipeline import (
    resolve_streams,
    run_pipeline,
    stream_venue,
)

FIXTURES = Path(__file__).parent / "fixtures"


def _drain(query):
    query.processAllAvailable()


def test_resolve_streams_guards():
    assert ("aster", "usdt") in resolve_streams(all_=True)
    assert resolve_streams(streams="aster:coin") == [("aster", "usdt")]
    assert resolve_streams(streams="hyperliquid:usdt") == [("hyperliquid", "usdc")]
    assert resolve_streams(exchange="binance", market="coin") == [("binance", "coin")]
    with pytest.raises(ValueError):
        resolve_streams(streams="kraken:usdt")
    with pytest.raises(ValueError):
        resolve_streams()


def test_stream_normalize_memory_sink(spark, tmp_path):
    src = tmp_path / "binance"
    src.mkdir()
    shutil.copy(FIXTURES / "binance_force_order.jsonl", src / "b1.jsonl")

    liq = stream_venue(spark, "binance", "usdt", str(src))
    q = (
        liq.writeStream.format("memory")
        .queryName("liq_stream_t1")
        .outputMode("append")
        .start()
    )
    try:
        _drain(q)
        got = spark.sql("SELECT * FROM liq_stream_t1").collect()
        assert len(got) == 5  # same rows as the batch golden test

        # drop a second file -> next micro-batch picks it up (S7/S8 shape)
        extra = {
            "e": "forceOrder", "E": 1710000100000,
            "o": {"s": "OPUSDT", "S": "SELL", "q": "7", "p": "2.5",
                  "ap": "2.6", "l": "7", "z": "7", "T": 1710000100123},
        }
        (src / "b2.jsonl").write_text(json.dumps(extra) + "\n")
        _drain(q)
        got2 = spark.sql("SELECT symbol FROM liq_stream_t1").collect()
        assert len(got2) == 6
        assert any(r["symbol"] == "OPUSDT" for r in got2)
    finally:
        q.stop()


def test_watermark_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "hl" / "20250923"
    src.mkdir(parents=True)
    line = (FIXTURES / "hyperliquid_fills.jsonl").read_text().splitlines()[0]
    (src / "0").write_text(line + "\n")

    # stream_venue applies the watermark-bounded ST1 dedup on
    # tid|liq_user|coin for hyperliquid automatically
    deduped = stream_venue(spark, "hyperliquid", "usdc", str(tmp_path / "hl"))
    q = (
        deduped.writeStream.format("memory")
        .queryName("liq_stream_t2")
        .outputMode("append")
        .start()
    )
    try:
        _drain(q)
        assert spark.sql("SELECT * FROM liq_stream_t2").count() == 1
        # same fill arrives again in a LATER hour file (tail/backfill overlap,
        # the exact scenario the reference's ring handles at :268-272)
        (src / "1").write_text(line + "\n")
        _drain(q)
        assert spark.sql("SELECT * FROM liq_stream_t2").count() == 1  # deduped
    finally:
        q.stop()


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    src = tmp_path / "okx"
    src.mkdir()
    shutil.copy(FIXTURES / "okx_liquidation_orders.jsonl", src / "f1.jsonl")
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    sink = FanOutConfig(parquet_path=str(out / "parquet"))

    q = run_pipeline(
        spark, [("okx", "usdt")], {"okx": str(src)}, sink,
        checkpoint_dir=ckpt,
    )
    try:
        _drain(q)
    finally:
        q.stop()
    first = spark.read.parquet(str(out / "parquet")).count()
    assert first == 4

    # restart from the same checkpoint: already-committed files must not
    # be reprocessed (exactly-once upgrade over the reference, §2.7)
    q2 = run_pipeline(
        spark, [("okx", "usdt")], {"okx": str(src)}, sink,
        checkpoint_dir=ckpt,
    )
    try:
        _drain(q2)
        # and new data after restart flows through
        extra = {
            "arg": {"channel": "liquidation-orders", "instType": "SWAP"},
            "data": [{"instType": "SWAP", "instId": "DOGE-USDT-SWAP",
                      "details": [{"posSide": "long", "side": "sell",
                                   "bkPx": "0.2", "fillPx": "0.21",
                                   "sz": "50", "ts": "1710000009123"}]}],
        }
        (src / "f2.jsonl").write_text(json.dumps(extra) + "\n")
        _drain(q2)
    finally:
        q2.stop()
    df = spark.read.parquet(str(out / "parquet"))
    assert df.count() == 5
    assert df.filter(F.col("symbol") == "DOGE-USDT-SWAP").count() == 1
    # K3/K5 layout: partition dirs by exchange/market/date
    parts = {p.name for p in (out / "parquet").iterdir() if p.is_dir()}
    assert parts == {"exchange=okx"}


def test_fanout_multi_sink(spark, tmp_path):
    src = tmp_path / "bybit"
    src.mkdir()
    shutil.copy(FIXTURES / "bybit_liquidation.jsonl", src / "f1.jsonl")
    out = tmp_path / "out2"
    sink = FanOutConfig(
        parquet_path=str(out / "parquet"), csv_path=str(out / "csv")
    )
    q = run_pipeline(
        spark, [("bybit", "usdt")], {"bybit": str(src)}, sink,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    try:
        _drain(q)
    finally:
        q.stop()
    pq = spark.read.parquet(str(out / "parquet"))
    assert pq.count() == 8
    csv_files = list((out / "csv").rglob("*.csv"))
    assert csv_files, "csv partition files written"
    # daily-rotation analogue: a date= partition level exists (ST3/K3)
    assert any("date=" in str(p) for p in csv_files)


def test_multi_market_requires_per_pair_dirs(spark, tmp_path):
    src = tmp_path / "binance"
    src.mkdir()
    sink = FanOutConfig(parquet_path=str(tmp_path / "p"))
    with pytest.raises(ValueError, match="multiple markets"):
        run_pipeline(
            spark,
            [("binance", "usdt"), ("binance", "coin")],
            {"binance": str(src)},  # exchange-keyed dir is ambiguous here
            sink,
            checkpoint_dir=str(tmp_path / "c"),
        )


def test_ws_datasource_registers(spark):
    from liq_stream_spark.sources.ws_datasource import (
        LiquidationWSDataSource,
        VENUE_URLS,
        register,
    )

    register(spark)  # must not raise; format resolution happens lazily
    assert ("binance", "usdt") in VENUE_URLS
    assert LiquidationWSDataSource.name() == "liqws"
    # reader construction validates venue/market
    from liq_stream_spark.sources.ws_datasource import LiquidationWSReader

    with pytest.raises(ValueError):
        LiquidationWSReader({"venue": "kraken", "market": "usdt"})


def test_pg_bootstrap_statements_reference_parity():
    """No PG in the container — assert the emitted DDL strings carry the
    reference's table shape and BOTH indexes with the same derived names
    and idempotence guards (writer_pg.py:24-57,124-136)."""
    from liq_stream_spark.sinks import bootstrap_statements

    stmts = bootstrap_statements("public.liquidations")
    assert len(stmts) == 2
    table_sql, index_sql = stmts
    assert "CREATE TABLE IF NOT EXISTS public.liquidations" in table_sql
    for col in ("exchange TEXT NOT NULL", "notional DOUBLE PRECISION",
                "ts_exch_ms BIGINT", "raw TEXT"):
        assert col in table_sql
    # index names derive from the short table name, as in the reference
    assert "CREATE INDEX liquidations_ts_idx ON public.liquidations (ts_exch_ms)" in index_sql
    assert ("CREATE INDEX liquidations_sym_ts_idx ON public.liquidations "
            "(exchange, market, symbol, ts_exch_ms)") in index_sql
    # idempotence guard probes pg_class before each CREATE
    assert index_sql.count("IF NOT EXISTS") == 2
    assert index_sql.count("pg_class") == 2


def test_pg_exactly_once_statements():
    """No PG in the container — assert the exactly-once promotion
    statement sequence: ledger DDL with epoch primary key, then the
    atomic claim+promote where the INSERT only runs if the ledger claim
    won (ON CONFLICT DO NOTHING + EXISTS guard)."""
    from liq_stream_spark.sinks import idempotent_statements

    cols = ["exchange", "market", "symbol", "qty"]
    ledger, promote = idempotent_statements(
        "public.liquidations", "public.liquidations_stage_7", 7, cols
    )
    assert "CREATE TABLE IF NOT EXISTS public.liquidations_epochs" in ledger
    assert "epoch_id BIGINT PRIMARY KEY" in ledger
    assert "INSERT INTO public.liquidations_epochs (epoch_id) VALUES (7)" in promote
    assert "ON CONFLICT (epoch_id) DO NOTHING" in promote
    assert "INSERT INTO public.liquidations" in promote
    assert "SELECT exchange, market, symbol, qty FROM public.liquidations_stage_7" in promote
    assert "WHERE EXISTS (SELECT 1 FROM claim)" in promote


def test_sixhour_dashboard_stream_equals_batch(spark, tmp_path):
    """Batch/stream unification for the windowed dashboard: the SAME
    transform over the SAME fixture rows produces identical aggregates
    whether run as a batch DataFrame or a streaming query (complete mode
    to a memory sink). Also pins the bucket alignment: F.window's 6h
    tumbling windows == the batch query's integer epoch-ms division."""
    from liq_stream_spark.operators.normalize_binance import normalize_binance
    from liq_stream_spark.sources.replay import read_jsonl_frames
    from liq_stream_spark.streaming.dashboard import sixhour_dashboard

    src = tmp_path / "binance"
    src.mkdir()
    shutil.copy(FIXTURES / "binance_force_order.jsonl", src / "b1.jsonl")

    batch = sixhour_dashboard(
        normalize_binance(
            read_jsonl_frames(spark, str(src / "b1.jsonl")), market="usdt"
        )
    )
    expected = sorted(map(tuple, batch.collect()))

    liq = stream_venue(spark, "binance", "usdt", str(src))
    q = (
        sixhour_dashboard(liq)
        .writeStream.format("memory")
        .queryName("dash_t1")
        .outputMode("complete")
        .start()
    )
    try:
        _drain(q)
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM dash_t1").collect())
        )
        assert got == expected
        assert len(got) > 0
    finally:
        q.stop()


def test_drain_mode_processes_backlog_and_stops(spark, tmp_path):
    """availableNow drain (--drain): the query consumes the existing
    backlog and TERMINATES ITSELF; a second drain after new files arrive
    processes only the delta (checkpoint-aware) and stops again."""
    src = tmp_path / "okx"
    src.mkdir()
    shutil.copy(FIXTURES / "okx_liquidation_orders.jsonl", src / "f1.jsonl")
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    sink = FanOutConfig(parquet_path=str(out / "parquet"))

    q = run_pipeline(
        spark, [("okx", "usdt")], {"okx": str(src)}, sink,
        checkpoint_dir=ckpt, available_now=True,
    )
    assert q.awaitTermination(120), "drain query did not self-terminate"
    assert spark.read.parquet(str(out / "parquet")).count() == 4

    extra = {
        "arg": {"channel": "liquidation-orders", "instType": "SWAP"},
        "data": [{"instType": "SWAP", "instId": "DOGE-USDT-SWAP",
                  "details": [{"posSide": "long", "side": "sell",
                               "bkPx": "0.2", "fillPx": "0.21",
                               "sz": "50", "ts": "1710000009123"}]}],
    }
    (src / "f2.jsonl").write_text(json.dumps(extra) + "\n")
    q2 = run_pipeline(
        spark, [("okx", "usdt")], {"okx": str(src)}, sink,
        checkpoint_dir=ckpt, available_now=True,
    )
    assert q2.awaitTermination(120), "second drain did not self-terminate"
    assert spark.read.parquet(str(out / "parquet")).count() == 5


def test_resolve_streams_rejects_empty_spec():
    from liq_stream_spark.streaming.pipeline import resolve_streams

    with pytest.raises(ValueError, match="need --all"):
        resolve_streams(streams=",")
    with pytest.raises(ValueError, match="need --all"):
        resolve_streams()
