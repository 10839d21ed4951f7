"""The Arrow fast paths claim graceful degradation when pandas/numpy are
absent ("falls back to the expression form"). This container always has
them, so simulate absence by nulling the module bindings (inside a
monkeypatch context, after computing the fast-path reference) and assert
the fallback expression forms produce IDENTICAL values."""

from pyspark.sql import functions as F

from liq_stream_spark.operators import dedup as D
from liq_stream_spark.operators import similarity as S
from liq_stream_spark.operators import text as X


def _no_arrow(mp):
    for mod in (X, D, S):
        mp.setattr(mod, "pd", None)
        mp.setattr(mod, "np", None)


def _docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)


def test_simhash_table_fallback(spark, monkeypatch):
    docs = _docs(spark)
    fast = {tuple(r) for r in D.simhash_table(docs).collect()}
    with monkeypatch.context() as mp:
        _no_arrow(mp)
        fallback = {tuple(r) for r in D.simhash_table(docs).collect()}
    assert len(fast) == 80 and fallback == fast


def test_minhash_fallback(spark, monkeypatch):
    docs = _docs(spark)
    fast = {tuple(r) for r in D.minhash_signatures(docs).collect()}
    with monkeypatch.context() as mp:
        _no_arrow(mp)
        fallback = {tuple(r) for r in D.minhash_signatures(docs).collect()}
    assert len(fast) == 80 * 16 and fallback == fast


def test_shingle_and_cosine_fallbacks(spark, monkeypatch):
    docs = _docs(spark)
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(20)
    q = emb.filter(F.col("vec_id") < 3)
    fast_sh = {
        (r["doc_id"], tuple(r["h"]))
        for r in docs.select(
            "doc_id", X.char_ngram_hashes_fast("text").alias("h")
        ).collect()
    }
    fast_knn = {tuple(r) for r in S.cosine_topk(q, emb, k=5).collect()}
    with monkeypatch.context() as mp:
        _no_arrow(mp)
        fb_sh = {
            (r["doc_id"], tuple(r["h"]))
            for r in docs.select(
                "doc_id", X.char_ngram_hashes_fast("text").alias("h")
            ).collect()
        }
        fb_knn = {tuple(r) for r in S.cosine_topk(q, emb, k=5).collect()}
    assert fb_sh == fast_sh
    # ranks may differ only if two cosines tie within 1 ULP (pairwise vs
    # sequential summation); the fixture has no such ties
    assert fb_knn == fast_knn and len(fb_knn) == 15
