"""The LIVE leg of streaming/windows.tumbling_agg: watermark-gated append
finalization over micro-batches (the batch leg is oracle-gated as sj03)."""

import json

from pyspark.sql import functions as F

from liq_stream_spark.streaming.windows import tumbling_agg

SCHEMA = "ts timestamp, event_type string, value double"


def _write(dirpath, name, rows):
    (dirpath / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _aggs():
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("total_value"),
    ]


def test_windows_finalize_only_past_watermark(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(
        src,
        "b1.jsonl",
        [
            {"ts": "2025-01-01 10:01:00", "event_type": "click", "value": 1.0},
            {"ts": "2025-01-01 10:05:00", "event_type": "click", "value": 2.0},
            {"ts": "2025-01-01 10:07:00", "event_type": "view", "value": 4.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agged = tumbling_agg(
        stream,
        ts_col="ts",
        window="15 minutes",
        aggs=_aggs(),
        keys=["event_type"],
        watermark="1 minute",
    )
    assert agged.isStreaming
    q = (
        agged.writeStream.format("memory")
        .queryName("tw_live")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far past the first window's end; the late
        # batch both finalizes [10:00, 10:15) and opens a new window
        _write(
            src,
            "b2.jsonl",
            [
                {"ts": "2025-01-01 11:00:00", "event_type": "click", "value": 8.0},
            ],
        )
        q.processAllAvailable()
        rows = {
            (r["w_start"].isoformat(), r["event_type"]): r
            for r in spark.sql("select * from tw_live").collect()
        }
    finally:
        q.stop()
    key = ("2025-01-01T10:00:00", "click")
    assert key in rows, f"first window not finalized: {sorted(rows)}"
    assert rows[key]["n_events"] == 2
    assert rows[key]["total_value"] == 3.0
    assert rows[("2025-01-01T10:00:00", "view")]["total_value"] == 4.0
    # the 11:00 window is still open (watermark hasn't passed its end):
    # append mode must NOT have emitted it
    assert not any(k[0] == "2025-01-01T11:00:00" for k in rows)


def test_stream_batch_parity_on_finalized_windows(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    batch1 = [
        {"ts": f"2025-01-01 10:{m:02d}:00", "event_type": t, "value": float(m)}
        for m, t in [(1, "a"), (2, "b"), (14, "a"), (16, "a"), (29, "b")]
    ]
    _write(src, "b1.jsonl", batch1)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agged = tumbling_agg(
        stream, "ts", "15 minutes", _aggs(), ["event_type"], "1 minute"
    )
    q = (
        agged.writeStream.format("memory")
        .queryName("tw_parity")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(
            src,
            "b2.jsonl",
            [{"ts": "2025-01-01 12:00:00", "event_type": "a", "value": 0.0}],
        )
        q.processAllAvailable()
        streamed = {
            (r["w_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("select * from tw_parity").collect()
        }
    finally:
        q.stop()
    bdf = spark.createDataFrame(
        [tuple(r.values()) for r in batch1], "ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r["w_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_agg(
            bdf, "ts", "15 minutes", _aggs(), ["event_type"]
        ).collect()
    }
    # every batch window from batch1 was finalized by the 12:00 event and
    # must match the streaming output exactly
    for k, v in batch.items():
        assert streamed.get(k) == v, f"window {k}: stream {streamed.get(k)} vs batch {v}"


def test_session_windows_merge_and_finalize(spark, tmp_path):
    from liq_stream_spark.streaming.windows import session_agg

    src = tmp_path / "in3"
    src.mkdir()
    # user A: two bursts 5 min apart (one session at 10-min gap);
    # user B: one event
    _write(
        src,
        "b1.jsonl",
        [
            {"ts": "2025-01-01 10:00:00", "event_type": "a", "value": 1.0},
            {"ts": "2025-01-01 10:05:00", "event_type": "a", "value": 2.0},
            {"ts": "2025-01-01 10:02:00", "event_type": "b", "value": 7.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agged = session_agg(
        stream,
        ts_col="ts",
        gap="10 minutes",
        aggs=[F.count(F.lit(1)).alias("n_events")],
        keys=["event_type"],
        watermark="1 minute",
    )
    assert agged.isStreaming
    q = (
        agged.writeStream.format("memory")
        .queryName("sw_live")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is still at 10:04 — no session closed yet
        assert spark.sql("select * from sw_live").count() == 0
        _write(
            src,
            "b2.jsonl",
            [{"ts": "2025-01-01 12:00:00", "event_type": "a", "value": 0.0}],
        )
        q.processAllAvailable()
        rows = {
            (r["event_type"]): r
            for r in spark.sql("select * from sw_live").collect()
        }
    finally:
        q.stop()
    # user A's two bursts MERGED into one session of 2 events ending
    # last-event + gap; B's single event is its own session
    a = rows["a"]
    assert a["n_events"] == 2
    assert a["session_start"].isoformat() == "2025-01-01T10:00:00"
    assert a["session_end"].isoformat() == "2025-01-01T10:15:00"
    assert rows["b"]["n_events"] == 1
