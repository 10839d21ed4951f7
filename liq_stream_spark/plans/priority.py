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
# Round 5 reset (VERDICT r4 item 1): the r4 tier was 68 entries against
# a ~50 budget and ordered JVM-first, so the 18 that fell off the end
# were exactly the pandas-UDF/k-means similarity+dedup family. This
# round the tier is exactly (a) the 5 never-driver-sampled queries,
# (b) the 18 stale pandas-UDF/k-means entries (s04/s05/m01 among them
# gained oracles after their last sample, so their first hash-green is
# pending), and (c) the queries r5 itself rewrites — and the
# never-sampled + pandas family LEAD so the ~50 budget cannot miss them
# again.
CHANGED_SINCE_GREEN: list[str] = [
    # (a) never driver-sampled at all (zero rows in any CORRECTNESS_r*)
    "d13_dup_span_removal",
    "d14_verified_dedup_clusters",
    "s09_ivf_topk_pruned",
    "s10_lsh_topk_pruned",
    "s11_lsh_near_dup_pruned",
    # (b) oracles attached r4 after their last sample — first hash-green
    # pending
    "s04_cosine_topk_lsh",
    "s05_cosine_near_dup_lsh",
    "m01_multimodal_pipeline",
    # (b) stale greens: operator changed late in r4 (cosine zero-norm
    # guard, _banded_keys ''-key drop, 9-dp probe quantization, survivor
    # broadcast knob) after the r2/r3 green rows
    "s01_cosine_topk",
    "s02_knn_label_vote",
    "s03_cosine_near_dup_pairs",
    "s06_ivf_topk",
    "s07_pq_topk",
    "s08_ivfpq_topk",
    "d03_minhash_lsh_pairs",
    "d06_dedup_clusters",
    "d07_dedup_survivors",
    "d10_incremental_dedup",
    "d11_semantic_dedup",
    # (c) rewritten this round: bucketed bounded windows for the
    # event_type hot keys (q45/q47/q50), decile thresholds instead of a
    # global ntile (q36), d03 pair emission without distinct (above),
    # sessionize boundary-merge shave (q15 + liq_cascades ride it)
    "q45_twap",
    "q47_anomaly_zscore",
    "q50_ewma",
    "q36_spend_deciles",
    "q15_sessionization",
    "liq_cascades",
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
