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
# driver-green row. POLICY (VERDICT r5 items 1/4): an entry is added in
# the SAME COMMIT as the code change it describes — never pre-declared
# for planned work — so this list and `git log` always agree. Reset to
# the new round's committed changes at round open (CORRECTNESS_r08
# greened the full 50-slot sample — every r8 entry led and
# hash-matched, q30 rows-only clean by design — so the r9 baseline is
# empty); entries below accumulate as r9 commits land. Tier convention:
# cheap JVM-only entries lead (cold-session Arrow/daemon spin-up must
# not land on a pandas-UDF query).
CHANGED_SINCE_GREEN: list[str] = [
    # r13 — the OPTIMIZATION round's plan rewrites (each entry's results
    # are oracle-identical by the round's rules, re-driven green locally
    # at sf0.01+sf0.1 before its commit, but the driver ledger must
    # re-sign them; cheap JVM-only entries lead per the tier
    # convention):
    #
    # - q01/q02/q03 + t01: compute-spread guard on the serial scan
    #   stages (a5f43fe); q47/q50: phase-1 exchange exempt from AQE
    #   coalescing (8073e0c); t13/p10: bigram-LM level derivation
    #   (16a7071); g01: vertex/degree frames materialized once
    #   (8e1c767).
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_region_revenue",
    # - q09: multi-distinct Expand replaced by three independent
    #   single-distinct aggs crossJoined (1-row frames).
    "q09_distinct_stats",
    "q47_anomaly_zscore",
    "q50_ewma",
    "t01_doc_stats",
    "t13_lm_perplexity",
    "p10_perplexity_buckets",
    "g01_pagerank",
    # - t14 (+p14's scorer front): hashed_linear_score rewritten to
    #   model-as-literal in-row inference — zero shuffles, zero joins.
    "t14_quality_classifier",
    # - s01/s02: cosine_topk corpus side spread-guarded (a5f43fe);
    #   d02/d03/d10/d12/g02/p01: minhash_sig_arrays / quality_features
    #   scan-stage spread (a5f43fe); d06/d07/d14/p13/p14: the
    #   connected-components loop lost two per-round jobs (7e74b23).
    "s01_cosine_topk",
    "s02_knn_label_vote",
    "d02_minhash_signatures",
    "d03_minhash_lsh_pairs",
    "g02_triangle_counts",
    "d10_incremental_dedup",
    "d12_minhash_jaccard_est",
    "p01_training_prep",
    "d06_dedup_clusters",
    "d07_dedup_survivors",
    "d14_verified_dedup_clusters",
    "p13_leakage_free_split",
    "p14_quality_survivors",
    # - round-open set: store.py lock-release registry hygiene + the
    #   run_pipeline lock-wait default (736baea) re-queue the
    #   store-backed consumers per the module-change convention.
    "d15_band_index_pairs",
    "s06_ivf_topk",
    "s07_pq_topk",
    "s08_ivfpq_topk",
    "s09_ivf_topk_pruned",
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
