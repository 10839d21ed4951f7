"""Plan-shape pins for the headline queries (ARCHITECTURE.md "hot paths"):
these are the properties that make the plans survive a 100x scale-up, so a
regression here is a performance bug even while results stay correct.

- q01: aggregation goes straight onto a pruned, filter-pushed scan — ONE
  exchange (the partial->final agg shuffle), no join.
- q02: global top-k plans as TakeOrderedAndProject (never a full sort) and
  the fact-fact join side that fits broadcasts.
- q03: every dimension join is a BroadcastHashJoin — zero SortMergeJoin at
  test SF; scans read only the referenced columns.
- q17: the as-of join is the union->single-shuffle window shape — exactly
  ONE exchange in the whole plan.
"""

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def count(marker: str, plan: str) -> int:
    return len(re.findall(re.escape(marker), plan))


def test_q01_agg_on_pruned_pushed_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert count("Exchange", plan) == 1           # one agg shuffle, no join
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # column pruning: the scan reads the 7 referenced lineitem columns,
    # not the full 16-column table
    read_cols = scan.split("FileScan parquet [")[1].split("]")[0].split(",")
    assert len(read_cols) <= 7
    # the shipdate filter reached the scan
    assert "l_shipdate" in scan and "DataFilters: [isnotnull(l_shipdate" in scan


def test_q02_global_topk_without_full_sort(spark):
    plan = plan_of(spark, "q02_top_revenue_orders")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_q03_all_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "q03_region_revenue")
    assert count("BroadcastHashJoin", plan) == 4  # orders/customer/nation/region
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q17_asof_is_single_shuffle(spark):
    plan = plan_of(spark, "q17_asof_enrichment")
    assert count("Exchange", plan) == 1           # union -> ONE keyed shuffle
    assert "SortMergeJoin" not in plan
    # both event_type filters pushed to their scans
    assert count("event_type", plan.split("Window")[-1]) >= 2


@pytest.mark.parametrize(
    "name", ["d03_minhash_lsh_pairs", "s05_cosine_near_dup_lsh", "s06_ivf_topk"]
)
def test_llm_scale_paths_never_cross_join(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    if name == "s06_ivf_topk":
        # the ONLY nested loop allowed is corpus/query x the broadcast
        # 16-row centroid table (IVF assignment — O(N*k), intentional);
        # every join against the corpus-sized inverted file is equi
        assert count("BroadcastNestedLoopJoin", plan) <= 2
    else:
        assert "BroadcastNestedLoopJoin" not in plan
