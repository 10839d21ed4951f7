"""Streaming doc dedup (streaming/doc_dedup.py): the batch dedup family's
semantics under Structured Streaming, cross-micro-batch via keyed state.

The discriminating case: a token-order permutation has a DIFFERENT sha256
but the SAME 64-bit SimHash (the signature sums per-token contributions),
so exact dedup keeps it while simhash dedup drops it."""

import json

from liq_stream_spark.streaming.doc_dedup import (
    dedup_docs_exact,
    dedup_docs_simhash,
)

BASE = "the quick brown fox jumps high"
PERM = "jumps high the quick brown fox"   # same tokens, reordered
OTHER = "completely different words entirely somewhere"


def _write(src, fname, rows):
    (src / fname).write_text(
        "\n".join(
            json.dumps({"doc_id": i, "ts": f"2024-01-01 00:0{t}:00", "text": x})
            for i, t, x in rows
        )
        + "\n"
    )


def _start(spark, src, name, op):
    df = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return (
        op(df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def test_exact_vs_simhash_streaming_dedup(spark, tmp_path):
    src_e = tmp_path / "e"
    src_s = tmp_path / "s"
    src_e.mkdir()
    src_s.mkdir()
    rows1 = [(0, 1, BASE), (1, 2, OTHER)]
    rows2 = [(2, 3, BASE), (3, 4, PERM)]  # exact dup + permuted near-dup
    for src in (src_e, src_s):
        _write(src, "f1.json", rows1)

    qe = _start(spark, src_e, "dd_exact", dedup_docs_exact)
    qs = _start(spark, src_s, "dd_simhash", dedup_docs_simhash)
    try:
        qe.processAllAvailable()
        qs.processAllAvailable()
        assert spark.sql("SELECT * FROM dd_exact").count() == 2
        assert spark.sql("SELECT * FROM dd_simhash").count() == 2

        for src in (src_e, src_s):
            _write(src, "f2.json", rows2)
        qe.processAllAvailable()
        qs.processAllAvailable()
        # exact: drops the byte-identical doc 2, KEEPS the permutation
        exact_ids = {
            r["doc_id"]
            for r in spark.sql("SELECT doc_id FROM dd_exact").collect()
        }
        assert exact_ids == {0, 1, 3}
        # simhash: the permutation collides with BASE's signature -> dropped
        sim_ids = {
            r["doc_id"]
            for r in spark.sql("SELECT doc_id FROM dd_simhash").collect()
        }
        assert sim_ids == {0, 1}
    finally:
        qe.stop()
        qs.stop()
