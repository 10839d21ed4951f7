"""Semantics tests for the corpus-hygiene operators (repetition signals,
contamination, stratified sampling, dedup survivors) on crafted inputs
where the right answer is computable by hand."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from liq_stream_spark.operators import dedup as D
from liq_stream_spark.operators import text as X


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionSignals:
    def test_hand_computed(self, spark):
        df = _docs(
            spark,
            [
                (1, "a a a b"),        # top a=3/4; 2grams: aa,aa,ab -> dup 2/3
                (2, "x y z"),          # all distinct, no dup 2grams
                (3, ""),               # empty: zeros
                (4, "w"),              # single token: no 2grams
            ],
        )
        out = {
            r["doc_id"]: r
            for r in X.repetition_signals(df).collect()
        }
        assert out[1]["n_tokens"] == 4
        assert out[1]["n_distinct_tokens"] == 2
        assert out[1]["top_token_frac"] == pytest.approx(3 / 4)
        assert out[1]["dup_2gram_frac"] == pytest.approx(2 / 3)
        assert out[2]["top_token_frac"] == pytest.approx(1 / 3)
        assert out[2]["dup_2gram_frac"] == 0.0
        assert out[3]["n_tokens"] == 0
        assert out[3]["top_token_frac"] == 0.0
        assert out[4]["n_tokens"] == 1
        assert out[4]["dup_2gram_frac"] == 0.0

    def test_boilerplate_flags_high(self, spark):
        # a spammy doc repeats one phrase; a clean doc does not
        spam = " ".join(["buy cheap stuff now"] * 10)
        clean = "the quick brown fox jumps over one lazy dog today"
        df = _docs(spark, [(1, spam), (2, clean)])
        out = {r["doc_id"]: r for r in X.repetition_signals(df).collect()}
        assert out[1]["dup_2gram_frac"] > 0.9
        assert out[2]["dup_2gram_frac"] == 0.0


class TestContamination:
    def test_overlap_counts(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
        corpus = _docs(
            spark,
            [
                # contains the bench 5-gram "alpha beta gamma delta epsilon"
                (1, "pre alpha beta gamma delta epsilon post"),
                # shares tokens but no 5-gram run
                (2, "alpha beta other gamma delta epsilon"),
                (3, "totally different words here entirely"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in X.contamination_flags(corpus, bench, n=5).collect()
        }
        assert out[1]["contaminated"] and out[1]["n_shared_ngrams"] == 1
        assert not out[2]["contaminated"]
        assert not out[3]["contaminated"]

    def test_duplicate_grams_counted_once(self, spark):
        bench = _docs(spark, [(100, "a b c d e")])
        # the corpus doc contains the bench 5-gram twice; distinct grams
        # per doc means it counts once
        corpus = _docs(spark, [(1, "a b c d e a b c d e")])
        row = X.contamination_flags(corpus, bench, n=5).collect()[0]
        assert row["n_shared_ngrams"] == 1


class TestStratifiedSample:
    def test_rates_and_determinism(self, spark):
        rows = [(i, "en" if i % 3 == 0 else "fr") for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        kept = X.stratified_sample(
            df, "lang", {"en": 8000}, default_bp=2000
        )
        counts = dict(
            kept.groupBy("lang").count().rdd.map(tuple).collect()
        )
        n_en = sum(1 for _, l in rows if l == "en")
        n_fr = len(rows) - n_en
        assert counts["en"] / n_en == pytest.approx(0.8, abs=0.05)
        assert counts["fr"] / n_fr == pytest.approx(0.2, abs=0.05)
        # determinism: same salt -> identical kept set
        again = X.stratified_sample(df, "lang", {"en": 8000}, default_bp=2000)
        assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )

    def test_membership_stable_under_growth(self, spark):
        small = spark.createDataFrame(
            [(i, "en") for i in range(500)], "doc_id long, lang string"
        )
        big = spark.createDataFrame(
            [(i, "en") for i in range(1000)], "doc_id long, lang string"
        )
        kept_small = {
            r["doc_id"]
            for r in X.stratified_sample(
                small, "lang", {}, default_bp=5000
            ).collect()
        }
        kept_big = {
            r["doc_id"]
            for r in X.stratified_sample(
                big, "lang", {}, default_bp=5000
            ).collect()
        }
        assert kept_small == {d for d in kept_big if d < 500}


class TestDedupSurvivors:
    def test_survivor_set(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(1, 8)], "doc_id long"
        )
        # clusters: {1,2,3} via 1-2, 2-3; {5,6}; singletons 4, 7
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
        )
        out = {
            r["doc_id"]: r["cluster_size"]
            for r in D.dedup_survivors(docs, pairs).collect()
        }
        assert out == {1: 3, 4: 1, 5: 2, 7: 1}


class TestStarEdges:
    def test_star_equals_clique_components(self, spark):
        from liq_stream_spark.plans.tables import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        sigs = D.minhash_sig_arrays(docs)
        clique = D.lsh_candidate_pairs_banded(sigs, max_bucket=None)
        star = D.lsh_star_edges(sigs)
        # star has no more edges than the clique expansion
        assert star.count() <= clique.count()
        cc_clique = {
            (r["node"], r["comp"])
            for r in D.connected_components(clique).collect()
        }
        cc_star = {
            (r["node"], r["comp"])
            for r in D.connected_components(star).collect()
        }
        assert cc_clique == cc_star


class TestDocFreqCap:
    def test_capped_jaccard_is_exact_over_capped_universe(self, spark):
        """max_doc_freq semantics: the capped operator computes EXACT
        Jaccard over the shingle universe with hot shingles removed —
        verified against an independent pure-Python computation of the
        same definition (and the corpus genuinely has hot shingles)."""
        from liq_stream_spark.operators.text import char_ngram_hashes_fast
        from liq_stream_spark.plans.tables import load

        cap = 40
        docs = load(spark, "/root/testdata/sf0.001", "documents")
        sh_rows = docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(char_ngram_hashes_fast("text", 3))
            ).alias("sh"),
        ).collect()
        from collections import Counter, defaultdict

        dfreq = Counter(r["sh"] for r in sh_rows)
        assert any(c > cap for c in dfreq.values())  # hot shingles exist
        sets = defaultdict(set)
        for r in sh_rows:
            if dfreq[r["sh"]] <= cap:
                sets[r["doc_id"]].add(r["sh"])
        ids = sorted(sets)
        expected = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                if inter and inter / len(sets[a] | sets[b]) >= 0.7:
                    expected.add((a, b))

        capped = D.ngram_jaccard_pairs(
            docs, threshold=0.7, max_doc_freq=cap
        )
        got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
        assert got == expected
