"""Count-bounded LRU dedup ring (streaming/ring_dedup.py): exact parity
with the reference's set+deque ring semantics —

- a key inside the ring is dropped,
- the ring evicts OLDEST-first at capacity,
- an evicted key is RE-ADMITTED (the behavior a time watermark cannot
  reproduce and the reason this operator exists),
- state survives across micro-batches (applyInPandasWithState)."""

import json

from pyspark.sql import functions as F

from liq_stream_spark.streaming.pipeline import stream_venue
from liq_stream_spark.streaming.ring_dedup import ring_dedup


def _start(spark, src, name, ring_size):
    df = (
        spark.readStream.schema("k string, ts long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = ring_dedup(df, "k", ring_size=ring_size, n_groups=1, order_col="ts")
    return (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def _write(src, fname, rows):
    (src / fname).write_text(
        "\n".join(json.dumps({"k": k, "ts": t}) for k, t in rows) + "\n"
    )


def test_ring_semantics_across_batches(spark, tmp_path):
    src = tmp_path / "keys"
    src.mkdir()
    # batch 1: a, b, a(dup)            -> emit a, b        ring [a, b]
    _write(src, "f1.json", [("a", 1), ("b", 2), ("a", 3)])
    q = _start(spark, src, "ring_t1", ring_size=3)
    try:
        q.processAllAvailable()
        got = [r["k"] for r in spark.sql(
            "SELECT k FROM ring_t1 ORDER BY ts").collect()]
        assert got == ["a", "b"]
        # batch 2: c, d -> emit both; d's admission evicts a    ring [b, c, d]
        _write(src, "f2.json", [("c", 4), ("d", 5)])
        q.processAllAvailable()
        got = [r["k"] for r in spark.sql(
            "SELECT k FROM ring_t1 ORDER BY ts").collect()]
        assert got == ["a", "b", "c", "d"]
        # batch 3: a was evicted -> RE-ADMITTED (evicts b); then b, newly
        # evicted, is re-admitted too (evicts c)               ring [d, a, b]
        _write(src, "f3.json", [("a", 6), ("b", 7)])
        q.processAllAvailable()
        got = [r["k"] for r in spark.sql(
            "SELECT k FROM ring_t1 ORDER BY ts").collect()]
        assert got == ["a", "b", "c", "d", "a", "b"]
        # batch 4: c (evicted in batch 3) re-admits -> oldest-first
        # eviction held throughout                             ring [a, b, c]
        _write(src, "f4.json", [("c", 8)])
        q.processAllAvailable()
        got = [r["k"] for r in spark.sql(
            "SELECT k FROM ring_t1 ORDER BY ts").collect()]
        assert got == ["a", "b", "c", "d", "a", "b", "c"]
    finally:
        q.stop()


def test_within_batch_order_and_dups(spark, tmp_path):
    src = tmp_path / "keys2"
    src.mkdir()
    # one batch, shuffled arrival order: processing follows ts order
    _write(src, "f1.json", [("x", 3), ("y", 1), ("x", 2), ("z", 4)])
    q = _start(spark, src, "ring_t2", ring_size=10)
    try:
        q.processAllAvailable()
        got = [r["k"] for r in spark.sql(
            "SELECT k FROM ring_t2 ORDER BY ts").collect()]
        # y(1), x(2) admitted; x(3) dup; z(4) admitted
        assert got == ["y", "x", "z"]
    finally:
        q.stop()


def test_hl_stream_ring_mode_end_to_end(spark, tmp_path):
    """stream_venue with the ring mode drops the re-emitted HL fill across
    hour files, like the watermark mode — but by count, not time."""
    src = tmp_path / "hl" / "20250923"
    src.mkdir(parents=True)
    from pathlib import Path

    line = (
        Path(__file__).parent / "fixtures" / "hyperliquid_fills.jsonl"
    ).read_text().splitlines()[0]
    (src / "0").write_text(line + "\n")
    deduped = stream_venue(
        spark,
        "hyperliquid",
        "usdc",
        str(tmp_path / "hl"),
        hl_dedup_watermark=None,
        hl_dedup_ring_size=50,
    )
    assert "_dedup_key" not in deduped.columns
    q = (
        deduped.writeStream.format("memory")
        .queryName("ring_hl")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM ring_hl").count() == 1
        (src / "1").write_text(line + "\n")  # same fill re-emitted later
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM ring_hl").count() == 1  # deduped
    finally:
        q.stop()


def test_ring_eviction_at_reference_volume(spark, tmp_path):
    """Volume parity with the reference's 50,000-key ring
    (hyperliquid_adapter.py:149-164): >50k distinct keys force real
    evictions, evicted keys re-admit, in-ring keys still drop, and the
    emitted sequence matches a pure-Python set+deque simulation of the
    reference bit-for-bit. Three micro-batches so eviction state crosses
    batch boundaries."""
    from collections import deque

    RING = 50_000
    src = tmp_path / "voly"
    src.mkdir()

    def keys(rng):
        return [f"k{i:06d}" for i in rng]

    # batch 1: 60k distinct -> all admitted, k0..k9999 evicted by the end
    b1 = keys(range(60_000))
    # batch 2: the 10k evicted keys re-admit (evicting k10000..k19999);
    # the 10k newest keys are still in the ring -> dropped
    b2 = keys(range(10_000)) + keys(range(50_000, 60_000))
    # batch 3: keys evicted by batch 2's re-admissions come back; keys
    # batch 2 just re-admitted are in-ring -> dropped
    b3 = keys(range(10_000, 15_000)) + keys(range(0, 5_000))
    ts = 0
    batches = []
    for rows in (b1, b2, b3):
        stamped = []
        for k in rows:
            stamped.append((k, ts))
            ts += 1
        batches.append(stamped)

    # reference simulation: membership set + FIFO deque of maxlen RING
    ring, seen, expected = deque(), set(), []
    for stamped in batches:
        for k, _t in stamped:
            if k in seen:
                continue
            expected.append(k)
            seen.add(k)
            ring.append(k)
            if len(ring) > RING:
                seen.discard(ring.popleft())

    _write(src, "f1.json", batches[0])
    q = _start(spark, src, "ring_vol", ring_size=RING)
    try:
        q.processAllAvailable()
        _write(src, "f2.json", batches[1])
        q.processAllAvailable()
        _write(src, "f3.json", batches[2])
        q.processAllAvailable()
        got = [
            r["k"]
            for r in spark.sql("SELECT k FROM ring_vol ORDER BY ts").collect()
        ]
    finally:
        q.stop()
    assert len(expected) == 75_000  # 60k + 10k re-admits + 5k re-admits
    assert got == expected
    # evictions really happened: batch-2/3 re-admissions only exist if
    # the ring dropped oldest keys past 50k
    assert got.count("k000000") == 2  # admitted, evicted, re-admitted
