"""Unit tests for the statistical quality models (operators/text):
bigram-LM perplexity scoring, the hashed linear classifier, and the
portable qround/qfloor_long quantizers they are built on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from liq_stream_spark.functions.core import qfloor_long, qround
from liq_stream_spark.operators.text import (
    bigram_lm_scores,
    hashed_linear_score,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# qround / qfloor_long portability
# ---------------------------------------------------------------------------


def test_qround_agrees_with_duckdb_floor_form_on_half_boundaries(spark):
    # values sitting EXACTLY on half boundaries at scale 3 — the case
    # where Spark round() (HALF_UP) and DuckDB round() (float half-even)
    # disagree; the floor form must agree with itself across engines
    vals = [0.0005, 0.0015, 0.0025, 1.0005, -0.0005, 2.5e-4 * 2, 0.123456,
            3.0017499999, 7.77777, -1.2345]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["q"]
        for r in sdf.select(qround(F.col("x"), 3).alias("q"))
        .orderBy("x")
        .collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT floor(x * 1e3 + 0.5) / 1e3 AS q FROM (SELECT unnest(?) AS x) ORDER BY x",
            [vals],
        ).fetchall()
    ]
    assert got == want


def test_qfloor_long_is_bigint_half_up(spark):
    sdf = spark.createDataFrame([(0.0015,), (-0.0015,)], "x double")
    rows = sdf.select(qfloor_long(F.col("x"), 3).alias("q")).collect()
    vals = sorted(r["q"] for r in rows)
    # 0.0015*1e3 = 1.4999999... in floats or exactly 1.5 depending on
    # bits — whatever the double says, both entries are pure functions
    # of it; just pin the type and the symmetry-breaking half-up rule
    assert all(isinstance(v, int) for v in vals)
    assert vals[1] - (-vals[0]) in (0, 1)  # half-up is asymmetric at .5


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def test_lm_scores_repetitive_text_as_more_likely(spark):
    fluent = "the cat sat on the mat " * 10
    jumble = "zq xv wk jm pl qa os dn fu gh"
    df = bigram_lm_scores(_docs(spark, [fluent.strip(), jumble]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["avg_nll"] < rows[1]["avg_nll"]
    assert rows[0]["ppl"] < rows[1]["ppl"]


def test_lm_short_and_empty_docs_are_null_scored(spark):
    df = bigram_lm_scores(_docs(spark, ["", "single", "two words"]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["n_bigrams"] == 0 and rows[0]["avg_nll"] is None
    assert rows[1]["n_bigrams"] == 0 and rows[1]["ppl"] is None
    assert rows[2]["n_bigrams"] == 1 and rows[2]["avg_nll"] is not None


def test_lm_separate_train_corpus(spark):
    train = _docs(spark, ["a b a b a b", "a b c"])
    score = _docs(spark, ["a b", "c a"])
    rows = {
        r["doc_id"]: r
        for r in bigram_lm_scores(score, train=train).collect()
    }
    # "a b" is the dominant training bigram -> much more likely than the
    # unseen "c a" (smoothed floor)
    assert rows[0]["avg_nll"] < rows[1]["avg_nll"]


def test_lm_is_deterministic_under_repartition(spark):
    texts = [f"tok{i % 7} tok{(i * 3) % 5} tok{i % 2} end" for i in range(40)]
    a = sorted(map(tuple, bigram_lm_scores(_docs(spark, texts)).collect()))
    b = sorted(
        map(
            tuple,
            bigram_lm_scores(_docs(spark, texts).repartition(13)).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# hashed linear classifier
# ---------------------------------------------------------------------------


def test_classifier_shapes_and_ranges(spark):
    df = hashed_linear_score(
        _docs(spark, ["hello world hello", "", "one two three four"])
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["n_tokens"] == 3
    assert rows[1]["n_tokens"] == 0 and rows[1]["prob"] is None
    assert rows[2]["n_tokens"] == 4
    for i in (0, 2):
        # per-token weights are in [-1000, 1000]/1000 -> margin in [-1, 1]
        assert -1.0 <= rows[i]["margin"] <= 1.0
        assert 0.0 < rows[i]["prob"] < 1.0


def test_classifier_is_case_insensitive_and_deterministic(spark):
    a = hashed_linear_score(_docs(spark, ["Hello World"])).collect()[0]
    b = hashed_linear_score(_docs(spark, ["hello world"])).collect()[0]
    assert a["margin"] == b["margin"] and a["prob"] == b["prob"]


def test_classifier_inference_is_shuffle_free(spark):
    # r13: the weight vector is a plan literal and the dot product an
    # in-row higher-order aggregate — classifier inference needs NO
    # exchange and NO join at any corpus size (the pre-r13 shape paid
    # two corpus-keyed exchanges plus a doc-spine stitch join)
    df = hashed_linear_score(_docs(spark, ["x y z"] * 10))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_classifier_literal_weights_match_expression_rule(spark):
    # the in-row literal (text._qw_weights) and the engine expression
    # md5_bucket(j, QW_SALT, 2001) - 1000 must be the SAME model — a
    # drift here would silently change every t14/p14 score
    from pyspark.sql import functions as F

    from liq_stream_spark.operators.text import (
        QW_BUCKETS,
        QW_SALT,
        _qw_weights,
        md5_bucket,
    )

    got = [
        r["w"]
        for r in spark.range(QW_BUCKETS)
        .select((md5_bucket("id", QW_SALT, mod=2001) - F.lit(1000)).alias("w"))
        .orderBy("id")
        .collect()
    ]
    assert got == _qw_weights()
    assert all(-1000 <= w <= 1000 for w in got)


# ---------------------------------------------------------------------------
# Gopher rule gate
# ---------------------------------------------------------------------------


def test_gopher_signals_and_gates(spark):
    from liq_stream_spark.operators.text import gopher_quality_signals

    good = (
        "the quick brown fox jumps over the lazy dog and runs on for a "
        "while in the sunny field with many other pleasant animals around "
        "it today because everything here is written in plain natural "
        "language sentences that keep going until the word count passes "
        "fifty words in total for the length gate to admit this text"
    )
    bullets = "\n".join("- item" for _ in range(10))
    rows = {
        r["doc_id"]: r
        for r in gopher_quality_signals(
            _docs(spark, [good, bullets, "", "@@ ## $$ %% ^^"])
        ).collect()
    }
    assert rows[0]["keep"] is True
    assert rows[0]["n_words"] >= 50 and rows[0]["n_stop_hits"] >= 2
    # bullet-heavy doc: every line is a bullet -> ratio 1.0 -> rejected
    assert rows[1]["frac_bullet_lines"] == 1.0 and rows[1]["keep"] is False
    # empty doc: NULL ratios, keep coalesces to False (never NULL)
    assert rows[2]["mean_word_len"] is None and rows[2]["keep"] is False
    # symbol soup: zero alpha words
    assert rows[3]["frac_alpha_words"] == 0.0 and rows[3]["keep"] is False


def test_entropy_orders_diversity(spark):
    from liq_stream_spark.operators.text import unigram_entropy

    diverse = "alpha beta gamma delta epsilon zeta eta theta"
    flat = "spam spam spam spam spam spam spam spam"
    rows = {
        r["doc_id"]: r
        for r in unigram_entropy(_docs(spark, [diverse, flat, ""])).collect()
    }
    assert rows[0]["entropy"] > rows[1]["entropy"]
    assert rows[1]["entropy"] == 0.0  # single repeated token
    assert rows[0]["n_types"] == 8 and rows[1]["n_types"] == 1
    assert rows[2]["n_tokens"] == 0 and rows[2]["entropy"] is None
