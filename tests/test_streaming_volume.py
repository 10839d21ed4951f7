"""Checkpoint recovery at volume (SURVEY.md §2.7 delivery upgrade):

replay 10^6 events through the full pipeline (JSON parse -> normalize ->
watermarked union dedup on RocksDB state -> epoch-partitioned parquet),
kill the query mid-stream, simulate the worst-case crash window (sink write
committed, checkpoint commit lost) by deleting the newest commit file, then
restart from the same checkpoint and assert EXACTLY-once: the replayed
epoch overwrites its own epoch_id= partition (sinks.write_parquet) instead
of appending duplicates, and compact_store folds the epoch level back into
the canonical layout with nothing lost or doubled.

Scale knob: LIQ_VOLUME_ROWS_PER_FILE (default 50_000 -> 1M rows total;
set lower for a quick smoke)."""

import json
import os
import time
from pathlib import Path

from pyspark.sql import functions as F

from liq_stream_spark.sinks import FanOutConfig
from liq_stream_spark.store import compact_store
from liq_stream_spark.streaming.pipeline import run_pipeline

N_FILES = 20
ROWS_PER_FILE = int(os.environ.get("LIQ_VOLUME_ROWS_PER_FILE", "50000"))
TOTAL = N_FILES * ROWS_PER_FILE
T0 = 1_710_000_000_000
SYMBOLS = ["BTCUSDT", "ETHUSDT", "SOLUSDT", "DOGEUSDT", "XRPUSDT"]

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _gen_frames(src: Path) -> None:
    """20 x 5k binance forceOrder frames; o.T is globally unique, so the
    natural identity (symbol, ts_exch_ms) counts duplicates exactly."""
    i = 0
    for f in range(N_FILES):
        lines = []
        for _ in range(ROWS_PER_FILE):
            ts = T0 + i
            lines.append(
                json.dumps(
                    {
                        "e": "forceOrder",
                        "E": ts,
                        "o": {
                            "s": SYMBOLS[i % len(SYMBOLS)],
                            "S": "SELL" if i % 2 else "BUY",
                            "q": str(1 + i % 9),
                            "p": str(100 + i % 50),
                            "ap": str(100 + i % 50),
                            "l": "1",
                            "z": "1",
                            "T": ts,
                        },
                    }
                )
            )
            i += 1
        (src / f"frames_{f:03d}.jsonl").write_text("\n".join(lines) + "\n")


def test_volume_kill_restart_exactly_once(spark, tmp_path):
    src = tmp_path / "binance"
    src.mkdir()
    _gen_frames(src)

    out = tmp_path / "out" / "parquet"
    ckpt = tmp_path / "ckpt"
    sink = FanOutConfig(parquet_path=str(out), parquet_exactly_once=True)

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        def start():
            return run_pipeline(
                spark,
                [("binance", "usdt")],
                {"binance": str(src)},
                sink,
                checkpoint_dir=str(ckpt),
                trigger_seconds=0.1,
                max_files_per_trigger=2,  # ~10 epochs over the 20 files
                union_dedup_watermark="10 minutes",  # RocksDB keyed state
            )

        q = start()
        commits = ckpt / "commits"
        try:
            # kill mid-stream: stop as soon as a few epochs are committed
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                if commits.exists() and len(list(commits.glob("[0-9]*"))) >= 3:
                    break
                time.sleep(0.1)
            else:
                raise AssertionError("no epochs committed within 120 s")
        finally:
            q.stop()

        committed = sorted(
            int(p.name) for p in commits.glob("[0-9]*") if p.name.isdigit()
        )
        assert committed, "expected committed epochs before the kill"
        # worst-case crash window: the sink write for the newest epoch is on
        # disk but its checkpoint commit record is lost -> Spark must replay
        # that epoch on restart with the SAME epoch id
        replayed = committed[-1]
        (commits / str(replayed)).unlink()
        # the local FS writes a checksum sibling; leaving it behind makes
        # the commit rewrite fail on restart with FileAlreadyExists
        crc = commits / f".{replayed}.crc"
        if crc.exists():
            crc.unlink()
        mid_rows = (
            spark.read.parquet(str(out)).count() if out.exists() else 0
        )
        assert mid_rows > 0, "kill happened before any sink write"

        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()

        df = spark.read.parquet(str(out))
        # exactly-once: every generated event exactly once, no replay dups
        assert df.count() == TOTAL
        assert df.select("symbol", "ts_exch_ms").distinct().count() == TOTAL
        # the replayed epoch exists exactly once as a partition
        epochs = [r["epoch_id"] for r in df.select("epoch_id").distinct().collect()]
        assert replayed in epochs and len(epochs) == len(set(epochs))
        per_epoch = df.groupBy("epoch_id").count().collect()
        assert sum(r["count"] for r in per_epoch) == TOTAL

        # compaction folds the epoch level into the canonical layout
        compacted = tmp_path / "store"
        compact_store(spark, str(out), str(compacted))
        cdf = spark.read.parquet(str(compacted))
        assert "epoch_id" not in cdf.columns
        assert cdf.count() == TOTAL
        assert cdf.select("symbol", "ts_exch_ms").distinct().count() == TOTAL
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
