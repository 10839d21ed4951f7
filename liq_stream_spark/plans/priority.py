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
# the new round's committed changes at round open (CORRECTNESS_r06
# greened all 11 r6 entries — the changed tier led the sample and every
# oracled one hash-matched — so the r7 baseline is empty); entries below
# accumulate as r7 commits land. Tier convention: cheap JVM-only entries
# lead (cold-session Arrow/daemon spin-up must not land on a pandas-UDF
# query).
CHANGED_SINCE_GREEN: list[str] = [
    # r7: q45/q47/q50's bounded-window bucket width is now DERIVED from
    # the frame's measured density (operators/bounded_window.
    # derive_bucket_seconds) instead of the hardcoded 24 h constant
    # (VERDICT r6 item 1); the moments operator also keeps its phase-1
    # decimal accumulators at natural precision (ADVICE r6 overflow
    # range fix). Oracles unchanged. All three JVM-only.
    "q45_twap",
    "q47_anomaly_zscore",
    "q50_ewma",
    # r7: d05's signature frame is materialized once (localCheckpoint —
    # both self-join sides plus Catalyst's inferred non-null join-key
    # filter were re-running the Pandas-UDF pass FOUR times), and
    # simhash_table round-robins a narrower-than-cores input before the
    # UDF (skew.spread_for_compute, no-op at real split counts). Oracles
    # unchanged; both re-driven green locally at sf0.01. Pandas-UDF
    # entries -> after the JVM-only tier above.
    "t04_simhash",
    "d05_simhash_near_pairs",
    # r7: the uncapped LSH expansion is chunk-parallel — each bucket's
    # sorted posting list is sliced into chunk-pair rows round-robined
    # across the cluster before the in-row pair generation, so a
    # degenerate bucket's O(n^2) expansion no longer serializes into
    # the one task owning its (band, key) (d03 2.8 -> 1.9 s, d14
    # 12.3 -> ~7.5 s warm at sf0.1). Pair set unchanged (chunk-sweep
    # parity test incl. chunk=1); oracles unchanged; d03/d12/d13/d14 +
    # d06 re-driven green locally at sf0.01.
    "d12_minhash_jaccard_est",
    "d14_verified_dedup_clusters",
    "d03_minhash_lsh_pairs",
    # r7: t12/t13/t14 spread their narrow-split fixture input before
    # the per-row Pandas-UDF scoring pass (skew.spread_for_compute at
    # the builder; no-op at real split counts). Oracles unchanged;
    # all three re-driven green locally at sf0.01. All three were
    # r4-stale, so listing them here costs the sample no extra slots.
    "t12_winnowing_fingerprints",
    "t13_lm_perplexity",
    "t14_quality_classifier",
    # r7: duplicate-UDF-evaluation audit — inner (pos)explodes let
    # Catalyst's InferFiltersFromGenerate add a size() > 0 filter below
    # the Generate that re-ran the whole Arrow signing/gram pass (now
    # *_outer + an explicit post-filter, emitted rows identical), and
    # the shingle/fingerprint/edge tables feeding 3-4 consumers are now
    # materialized once (localCheckpoint, the d11 convention; d18's
    # gram pass ran EIGHT times before). Oracles unchanged; pinned by
    # tests/test_plans.py::test_shingle_udf_evaluates_once_per_plan;
    # d06/d08/d12/d13/d15/d16/g01 also re-driven green locally at
    # sf0.01. Pandas-UDF entries -> changed tier tail.
    "d02_minhash_signatures",
    "d04_ngram_jaccard_pairs",
    "d19_containment_pairs",
    "d18_winnow_clone_pairs",
    "g02_triangle_counts",
    # (r7 review) two more consumers of the audited operators whose
    # executed plans changed with them: d08 rides ngram_jaccard_pairs'
    # materialized shingle table, g01 rides _banded_keys' outer
    # generate — both re-driven green locally at sf0.01
    "d08_ngram_jaccard_capped",
    "g01_pagerank",
    # r7: _assign_cells' argmax is a map-side-combinable max_by agg
    # instead of a row_number window over the corpus-x-cells crossJoin
    # (5x + far lower variance at 200k vectors — the window form
    # shuffled AND sorted every expanded row). Same (desc cos, asc
    # cell) order incl. NULL-scored zero-norm rows (pinned by
    # test_assign_cells_zero_norm_and_tiebreak); connected_components
    # also stops double-evaluating its callers' pair chain through the
    # symmetric union (d06/d14/p13/p14). Oracles unchanged; all
    # affected re-driven green locally at sf0.01.
    "s06_ivf_topk",
    "s08_ivfpq_topk",
    "s09_ivf_topk_pruned",
    "d11_semantic_dedup",
    "d06_dedup_clusters",
    "p13_leakage_free_split",
    "p14_quality_survivors",
    # r7: the CC loop's first round runs directly off the edge list
    # (min(dst) per src == the identity-label join it replaced; one
    # groupBy replaces the distinct + two label joins) — d14
    # 10.0 -> 6.3 s min-of-3 at sf0.1. Labels unchanged for any input;
    # oracles unchanged; d06/d07/d14/p13/p14 re-driven green at sf0.01
    # and the 200k-doc stress chain re-passed.
    "d07_dedup_survivors",
    # r7: s06/s07/s08/s09/d11 take their deterministic ANN index from
    # the per-(sf_dir, params) offline-build memo (plans/index_cache.py)
    # instead of re-training on every invocation — the FAISS-style
    # train/add/search split these operators document (probe-path
    # min-of-3 at sf0.1: s08 14.2 -> 3.7 s, s09 4.2 -> 1.4 s). Cached
    # rows are bit-identical to a rebuild (deterministic seeds/iters);
    # oracles unchanged and re-driven green locally at sf0.01.
    "s07_pq_topk",
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
