"""Verification-priority ordering for the external correctness harness.

The harness samples `__spark_entry__.queries()` in iteration order with a
bounded per-round budget (~50 of 85+ entries), so the order decides which
queries get a fresh driver-green row each round. The library REGISTRY
itself stays in registration order (this module never mutates it — see
ADVICE r3); `__spark_entry__` applies :func:`verification_order` at the
harness boundary, and every other consumer (QUERIES.md, tests, bench)
is order-independent.

Ordering rules, most important first:

1. **Changed since green** (`CHANGED_SINCE_GREEN`, hand-maintained each
   round): any query whose builder or underlying operator changed AFTER
   its last driver-green row goes first — a green row for code that no
   longer exists is the worst kind of stale signal (the r3 lesson: q15 and
   liq_cascades were rewritten onto sessionize_bucketed but kept riding
   their r2 greens). Within the tier, cheap JVM-only entries come first so
   cold-session Arrow/daemon spin-up doesn't land on a k-means query.
2. **Staleness**: everything else orders by the round of its latest
   driver signal (green row for oracled entries, clean rows-only run for
   the rest), never-sampled first, oldest next — computed from the
   `CORRECTNESS_r*.json` artifacts at the repo root via
   :func:`liq_stream_spark.tools.green_ledger`. Oracled entries sort
   before rows-only entries at equal staleness (a value-hash re-check
   beats a rows-ran re-check), and registration order breaks the
   remaining ties.

With ~50 budget and this ordering, every entry's hard signal refreshes
roughly every other round, and a rewrite can never coast on a pre-rewrite
green row.
"""

from __future__ import annotations

# Queries whose builder or underlying operator changed after their last
# driver-green row. Reset this list each round to the queries the round
# actually touched (the commit log is the source of truth).
#
# Round 4 additions: sj02 (new streaming-enrich parity), q41 (new
# bucketed fact join), t11 (new BPE merge pairs), d15 (new bucketed
# band-index pairs), s09 (new pruned-IVF oracle), m01 (synth bodies went
# ASCII + gained a full oracle), s06/s08 (ivf/ivfpq probe ranking now
# 9-dp-rounded — result-identical at their degenerations, but the
# operator changed after their r3 green). Carried from late-r3 (their
# greens still predate the change until CORRECTNESS_r04 lands): q15/
# liq_cascades (sessionize_bucketed rewrite), sj01/d12/d11/s04/s05/s07.
CHANGED_SINCE_GREEN: list[str] = [
    # Round-close additions: new salted skew-join query (never sampled);
    # d06/d14/p13/p14/t14/q50 oracle CTE refactors are below already.
    "q51_salted_skew_join",
    # Round 5 (this round): twenty-three NEW queries — lateral top-n, IGNORE NULLS
    # gap fill, streaming tumbling-agg parity, bigram-LM perplexity,
    # hashed linear classifier, fixed-iteration PageRank. All JVM-only
    # expression plans, so they lead the tier.
    "q43_lateral_topn",
    "q44_gap_fill",
    "sj03_tumbling_agg_batch_parity",
    "t13_lm_perplexity",
    "t14_quality_classifier",
    "g01_pagerank",
    "p10_perplexity_buckets",
    "p11_source_caps",
    "t15_gopher_rules",
    "q45_twap",
    "d18_winnow_clone_pairs",
    "g02_triangle_counts",
    "p12_corpus_report",
    "s12_label_centroids",
    "q46_retention_cohorts",
    "d19_containment_pairs",
    "q47_anomaly_zscore",
    "p13_leakage_free_split",
    "q48_above_nation_average",
    "q49_scd2_history",
    "t16_unigram_entropy",
    "q50_ewma",
    "p14_quality_survivors",
    # JVM-only first (no Arrow/pandas worker spin-up)
    "liq_unified_rows",
    "q42_recursive_month_spine",
    "q15_sessionization",
    "liq_cascades",
    "sj01_interval_join_batch_parity",
    "sj02_enrich_batch_parity",
    "q41_bucketed_revenue",
    "t11_bpe_merge_pairs",
    "t12_winnowing_fingerprints",
    "d12_minhash_jaccard_est",
    "d15_band_index_pairs",
    "d16_jaccard_prefix_filter",
    "p09_temperature_mix",
    "d17_lsh_tuning_curve",
    # operator/oracle-level review fixes late in r4 (results unchanged
    # on the fixtures, but the code or oracle under these greens moved):
    # fingerprint NULL arm (t03), _banded_keys ''-key drop
    # (d03/d06/d10/d14), survivor broadcast knob (d07), interval-join
    # rid materialization (q32), md5_bucket extraction (p02/p04), cosine
    # zero-norm guard (s01-s03), t01/p01 empty-doc score guard, binance
    # keep-filter oracle alignment (liq_*), dsum consolidation
    # (q37/q39/liq aggregates), shared bands CTE (d12/d14/d15)
    "t01_doc_stats",
    "p01_training_prep",
    "q37_unpivot_measures",
    "q39_grouping_sets",
    "liq_venue_stats",
    "liq_top_by_notional",
    "liq_hourly_by_symbol",
    "liq_sixhour_dashboard",
    "t03_fingerprint",
    "q32_interval_join",
    "p02_hash_split",
    "p04_stratified_sample",
    # pandas-UDF / k-means entries after
    "m01_multimodal_pipeline",
    "d03_minhash_lsh_pairs",
    "d06_dedup_clusters",
    "d07_dedup_survivors",
    "d10_incremental_dedup",
    "d14_verified_dedup_clusters",
    "s01_cosine_topk",
    "s02_knn_label_vote",
    "s03_cosine_near_dup_pairs",
    "s04_cosine_topk_lsh",
    "s05_cosine_near_dup_lsh",
    "s06_ivf_topk",
    "s07_pq_topk",
    "s08_ivfpq_topk",
    "s09_ivf_topk_pruned",
    "s10_lsh_topk_pruned",
    "s11_lsh_near_dup_pruned",
    "d11_semantic_dedup",
]


def verification_order() -> list[str]:
    """All registry names, harness-priority first. Pure function of the
    REGISTRY and the CORRECTNESS_r*.json artifacts; raises loudly if
    CHANGED_SINCE_GREEN references a renamed/unknown query."""
    from liq_stream_spark.plans import REGISTRY
    from liq_stream_spark.tools import green_ledger

    missing = [n for n in CHANGED_SINCE_GREEN if n not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"CHANGED_SINCE_GREEN references unknown queries: {missing}"
        )
    ledger = green_ledger()
    reg_index = {n: i for i, n in enumerate(REGISTRY)}
    changed = set(CHANGED_SINCE_GREEN)

    def staleness_key(name: str):
        entry = ledger.get(name)
        latest = entry["round"] if entry else -1  # never sampled -> first
        oracled = REGISTRY[name].oracle is not None
        return (latest, 0 if oracled else 1, reg_index[name])

    rest = sorted((n for n in REGISTRY if n not in changed), key=staleness_key)
    return list(CHANGED_SINCE_GREEN) + rest
