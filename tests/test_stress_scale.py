"""Env-gated volume stress test for the fuzzy-dedup chain.

Run with LIQ_STRESS=1 (skipped by default — ~1-2 min): generates 200k
synthetic docs JVM-side with planted near-dup families and drives
MinHash signing -> banded LSH (bucket-capped) -> star edges ->
connected components at a scale where a quadratic regression or a
skew-unsafe plan is felt, not just read about.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("LIQ_STRESS"),
    reason="volume stress test; set LIQ_STRESS=1 to run",
)

N_DOCS = int(os.environ.get("LIQ_STRESS_DOCS", "200000"))
FAMILY_EVERY = 1000  # ids [k, k+5) share a base text for k % 1000 == 0
FAMILY_SIZE = 5


def _synth_docs(spark, n):
    """Deterministic corpus: 30 pseudo-words from md5(base_id, j); family
    members share base_id and differ only by a tiny ' v<i>' suffix, so
    within-family 3-gram Jaccard is ~0.95+ and cross-family text is
    unrelated."""
    base = F.when(
        (F.col("id") % FAMILY_EVERY) < FAMILY_SIZE,
        F.col("id") - (F.col("id") % FAMILY_EVERY),
    ).otherwise(F.col("id"))
    words = F.expr(
        "concat_ws(' ', transform(sequence(1, 30), "
        "j -> substring(md5(concat(base_id, '-', j)), 1, 8)))"
    )
    return (
        spark.range(n)
        .withColumn("base_id", base)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                words, F.lit(" v"), (F.col("id") % FAMILY_EVERY).cast("string")
            ).alias("text"),
        )
    )


def test_verified_dedup_chain_at_volume(spark):
    """Drives the d14 PRODUCTION chain (LSH candidates -> MinHash
    Jaccard-estimate threshold -> components). The verification step is
    load-bearing at this scale, not a refinement: 200k docs is 2e10
    pairs, so even the ~(s^4)x4 ~ 5e-7 random band-collision rate of the
    (b=4, r=4) banding yields tens of thousands of spurious candidates,
    and UNVERIFIED transitive closure chains them into mega-clusters
    (observed: a 1.9k-doc component). The estimate filter (>=8/16
    agreeing permutations) kills random pairs (est ~0.03) while
    within-family pairs (jaccard ~0.95) sail through."""
    from liq_stream_spark.operators.dedup import (
        dedup_clusters,
        lsh_candidate_pairs_banded,
        minhash_estimate_bar,
        minhash_jaccard_estimates,
        minhash_sig_arrays,
    )

    docs = _synth_docs(spark, N_DOCS)
    n_families = N_DOCS // FAMILY_EVERY

    t0 = time.time()
    sigs = minhash_sig_arrays(docs).localCheckpoint(eager=True)
    t_sign = time.time() - t0

    t0 = time.time()
    cand = lsh_candidate_pairs_banded(sigs, max_bucket=1000)
    # The OPERATOR'S corpus-size-aware default (VERDICT r10 item 1 —
    # the regime this probe discovered, now owned by dedup.py): 8/16
    # (est >= 0.5) at fixture scale, 12/16 past the ~400k-doc boundary
    # where quadratic candidate volume multiplies the borderline tail
    # into chaining territory (2M docs at 8/16: 14M candidates, ~18k
    # false pairs, a 35-doc chained cluster). The math lives in
    # minhash_estimate_bar's docstring.
    est_threshold = minhash_estimate_bar(N_DOCS)
    verified = (
        minhash_jaccard_estimates(sigs, cand)
        .filter(F.col("n_agree") >= est_threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_cand, n_verified = cand.count(), verified.count()
    t_verify = time.time() - t0

    t0 = time.time()
    clusters = dedup_clusters(verified)
    rows = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    t_cluster = time.time() - t0

    sizes = sorted((r["n"] for r in rows), reverse=True)
    full_families = sum(1 for s in sizes if s == FAMILY_SIZE)
    print(
        f"\nstress: {N_DOCS} docs, sign={t_sign:.1f}s, "
        f"verify={t_verify:.1f}s ({n_cand} cand -> {n_verified} pairs), "
        f"cluster={t_cluster:.1f}s, clusters={len(sizes)}, "
        f"full families={full_families}/{n_families}, max={sizes[0]}"
    )
    # recovery: within-family jaccard ~0.95 -> band collision ~certain,
    # estimate >= 8/16 near-certain; require >=95% of families intact
    assert full_families >= 0.95 * n_families
    # precision: the verification filter must stop random band
    # collisions from chaining into mega-clusters. A HANDFUL of
    # borderline merges is expected statistics, not a bug: a candidate
    # pair already agrees on its colliding band's 4 permutations, so the
    # 16-perm estimate is biased high for it (P(>=8/16 | band hit at
    # s~0.03) ~ 4e-4, x ~1.4e5 candidates at 200k docs ~ tens possible,
    # scaling roughly linearly with the corpus) — production pipelines
    # that need zero false merges re-verify with the exact d04/d16
    # join. What must NEVER happen is the unverified chain's
    # mega-cluster (observed 1.9k docs without this filter), so the cap
    # tolerates one borderline TWO-FAMILY merge (seen at
    # LIQ_STRESS_DOCS=800000: one cluster of exactly 2*FAMILY_SIZE)
    # but not a chain of them, and the borderline COUNT scales with the
    # measured candidate volume (the statistical driver: bucket
    # occupancy grows with the corpus, so candidates grow super-linearly
    # — 1.4e5 at 200k docs, 2.25e6 at 800k; observed borderline
    # clusters: ~1-5 and 25 respectively, both well under p=4e-4).
    assert sizes[0] <= 3 * FAMILY_SIZE, sizes[:5]
    assert sum(1 for s in sizes if s > FAMILY_SIZE) <= max(
        5, n_cand // 50_000
    )
    # a quadratic regression shows up as minutes, not seconds
    assert t_sign + t_verify + t_cluster < 600


def test_band_index_append_is_o_batch_at_volume(spark, tmp_path):
    """The incremental-ingest contract measured, not just I/O-pinned:
    appending the SAME 5k-doc batch into a 10x larger stored corpus
    must cost the same wall time — the stored corpus is never re-hashed
    or re-shuffled, and the guarded path's duplicate-id check reads the
    _ids sidecar, not the index. A regression to O(corpus) ingest shows
    up as the big-corpus append scaling with the store (measured flat:
    ~2-4 s at both 100k and 1M docs)."""
    from liq_stream_spark import store

    def synth(n, start=0):
        return spark.range(start, start + n).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(sequence(1, 30), "
                "j -> substring(md5(concat(id, '-', j)), 1, 8)))"
            ).alias("text"),
        )

    walls = {}
    for corpus_n in (100_000, 1_000_000):
        table = f"obatch_{corpus_n}"
        path = str(tmp_path / f"band_{corpus_n}")
        store.write_band_index(synth(corpus_n), table, path)
        try:
            t0 = time.time()
            store.append_to_band_index(
                synth(5_000, start=corpus_n), table, path
            )
            walls[corpus_n] = time.time() - t0
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
    # generous 3x band: O(batch) means flat; O(corpus) is >= 10x here
    assert walls[1_000_000] <= 3 * walls[100_000] + 2.0, walls
    print(f"\nappend walls: {walls}")
