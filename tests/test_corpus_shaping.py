"""Corpus-shaping operators: packing invariants, chunk semantics, PII
redaction (cross-engine regex spec), C4-style line cleaning, PQ recall.

The fixture documents are single-line and PII-free, so the p06/p07/t08/t09
oracle matches exercise plumbing; the SEMANTIC weight — multi-line docs,
real PII strings, boundary chunks — lives here.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from liq_stream_spark.operators.corpus import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    doc_chunks,
    pack_offsets,
    pii_redact,
    quality_line_filter,
)


def test_pack_offsets_is_perfect_concatenation(spark):
    """Sorted by start_offset, every doc starts exactly where the previous
    one ended — the packing map is a bijection onto [0, total_tokens)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = sorted(
        pack_offsets(docs, 512).collect(), key=lambda r: r["start_offset"]
    )
    pos = 0
    for r in rows:
        assert r["start_offset"] == pos
        assert r["first_chunk"] == pos // 512
        end = pos + max(r["n_tokens"] - 1, 0)
        assert r["last_chunk"] == end // 512
        pos += r["n_tokens"]
    assert pos == sum(r["n_tokens"] for r in rows)


def test_pack_offsets_stable_under_repartition(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {tuple(r) for r in pack_offsets(docs, 128).collect()}
    b = {tuple(r) for r in pack_offsets(docs.repartition(13), 128).collect()}
    assert a == b and len(a) > 0


def test_doc_chunks_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in doc_chunks(df, chunk_tokens=4, stride=3).collect()
    }
    # doc 1: 10 tokens -> starts 0,3,6,9
    assert sorted(k for k in got if k[0] == 1) == [(1, 0), (1, 1), (1, 2), (1, 3)]
    assert got[(1, 0)]["chunk_text"] == "a b c d"
    assert got[(1, 1)]["chunk_text"] == "d e f g"
    assert got[(1, 3)]["chunk_text"] == "j"
    assert got[(1, 3)]["n_chunk_tokens"] == 1
    assert got[(2, 0)]["chunk_text"] == "x y"
    # empty / whitespace-only docs emit nothing
    assert not [k for k in got if k[0] in (3, 4)]


_PII_ROWS = [
    (1, "mail bob.smith+x@corp.example.org or b@x.io today"),
    (2, "server 10.0.0.1 and 192.168.1.255 up"),
    (3, "call 555-123-4567 or +1 (212) 555 0199 now"),
    (4, "mixed a@b.co at 8.8.8.8 phone 020 7946 0958"),
    (5, "none here, just words and 42"),
    (6, "v1.2.3.4 release"),  # version-like: matches the IPv4 shape
]


def test_pii_redact_spark_matches_duckdb(spark):
    """The three patterns are RE2-safe by construction; this pins that
    Java regex (Spark) and RE2 (DuckDB) agree on REAL PII strings, which
    the PII-free fixture oracle can't witness."""
    sdf = pii_redact(
        spark.createDataFrame(_PII_ROWS, "doc_id long, text string")
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR);"
        + "".join(
            f"INSERT INTO d VALUES ({i}, '{t}');" for i, t in _PII_ROWS
        )
    )
    want = {
        r[0]: tuple(r)[1:]
        for r in con.execute(
            f"""
            WITH a AS (
              SELECT doc_id,
                len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::BIGINT AS ne,
                regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
              FROM d
            ), b AS (
              SELECT doc_id, ne,
                len(regexp_extract_all(t1, '{PII_IPV4_RE}'))::BIGINT AS ni,
                regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
              FROM a
            )
            SELECT doc_id,
              regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g'),
              ne, ni,
              len(regexp_extract_all(t2, '{PII_PHONE_RE}'))::BIGINT
            FROM b
            """
        ).fetchall()
    }
    assert got == want
    # and the redactions are the intended ones
    assert got[1][0] == "mail <EMAIL> or <EMAIL> today"
    assert got[1][1] == 2
    assert got[2][0] == "server <IP> and <IP> up"
    assert got[3][0] == "call <PHONE> or <PHONE> now"
    assert got[5] == ("none here, just words and 42", 0, 0, 0)


def test_quality_line_filter_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "Good line with words.\nbad {code} here\nx y\nFine line two!"),
            (2, "Visit JavaScript site today\nLorem Ipsum dolor sit amet"),
            (3, "One decent line without punct\nShort no\nIt ends right."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_line_filter(df).collect()}
    assert got[1]["n_lines"] == 4 and got[1]["n_kept_lines"] == 2
    assert got[1]["clean_text"] == "Good line with words.\nFine line two!"
    assert got[2]["n_kept_lines"] == 0 and got[2]["clean_text"] == ""
    # terminal-punct mode drops the unpunctuated line too
    strict = {
        r["doc_id"]: r
        for r in quality_line_filter(
            df, require_terminal_punct=True
        ).collect()
    }
    assert strict[3]["n_kept_lines"] == 1
    assert strict[3]["clean_text"] == "It ends right."


def test_pq_topk_recall_and_shape(spark):
    """PQ ADC against the exact baseline: uniform-random embeddings are
    PQ's worst case (no cluster structure to quantize onto), so the gate
    is recall@10 >= 0.3 at m=16 — real embedding corpora sit far higher.
    Every query must get exactly k ranked neighbors (ADC scores the whole
    corpus; no candidate loss)."""
    from liq_stream_spark.operators.similarity import cosine_topk, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r[0], r[1]) for r in cosine_topk(q, emb, k=10).collect()}
    got = pq_topk(q, emb, k=10, m=16, n_codes=16).collect()
    pairs = {(r[0], r[1]) for r in got}
    assert len(exact & pairs) / len(exact) >= 0.3
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())
    assert len(per_q) == 20


def test_ivfpq_nprobe_all_equals_pq_and_recall(spark):
    """Plumbing invariant: with every cell probed, IVF-PQ is EXACTLY the
    full-PQ scan (the router only prunes, never rescores). At nprobe=4 the
    probe must keep recall above the no-router PQ floor."""
    from liq_stream_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    full = {tuple(r) for r in pq_topk(q, emb, k=10, m=16).collect()}
    ivf_all = {
        tuple(r)
        for r in ivfpq_topk(
            q, emb, k=10, n_cells=16, nprobe=16, m=16
        ).collect()
    }
    assert ivf_all == full
    exact = {(r[0], r[1]) for r in cosine_topk(q, emb, k=10).collect()}
    got = {
        (r[0], r[1])
        for r in ivfpq_topk(q, emb, k=10, n_cells=16, nprobe=4, m=16).collect()
    }
    assert len(got & exact) / len(exact) >= 0.3


def test_corpus_pipeline_runs_under_structured_streaming(spark, tmp_path):
    """The corpus-shaping operators are stateless Column projections, so
    the SAME functions run unchanged on a readStream: stream docs ->
    C4 line filter -> PII redact -> per-batch output equals the batch run
    of the identical composition."""
    import json

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        (1, "Email me at a@b.co please do.\nbad {tpl} line"),
        (2, "Call 555-123-4567 for a good time today"),
        (3, "short"),
    ]
    (src / "batch0.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows) + "\n"
    )

    def compose(df):
        cleaned = quality_line_filter(df).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        return pii_redact(cleaned)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
    )
    q = (
        compose(stream)
        .writeStream.format("memory")
        .queryName("corpus_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            tuple(r)
            for r in spark.sql("SELECT * FROM corpus_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        tuple(r)
        for r in compose(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got == batch
    by_id = {r[0]: r for r in got}
    assert by_id[1][1] == "Email me at <EMAIL> please do."
    assert by_id[2][1] == "Call <PHONE> for a good time today"
    assert by_id[3][1] == ""  # 'short' fails the min-words line gate
