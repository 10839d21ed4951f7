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
    # one agg shuffle, no join, plus (at fixture scale only) the
    # spread_for_compute hash exchange that parallelizes the decimal
    # partial agg on single-row-group inputs (r13; no-op >= cores
    # splits, so production plans keep 1)
    assert 1 <= count("Exchange", plan) <= 2
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
    # the revenue aggregation must sit BELOW the join (r6 pushdown): the
    # per-orderkey partial combine shrinks the fact shuffle before the
    # join ships anything — a HashAggregate above the join would mean
    # the rewrite regressed to join-then-aggregate
    join_pos = plan.find("Join")
    agg_pos = plan.rfind("HashAggregate")
    assert join_pos != -1 and agg_pos > join_pos, (
        "expected the lineitem aggregate below the join"
    )


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


def test_p03_benchmark_grams_are_broadcast(spark):
    # the corpus side must never shuffle its grams: the benchmark gram
    # set is the build side of broadcast joins, both for the semi (gram
    # match) and the final doc_id stitch
    plan = plan_of(spark, "p03_contamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q34_single_partitioning_for_window_and_agg(spark):
    # lag window and final aggregation share the custkey hash
    # partitioning: exactly one Exchange in the plan
    plan = plan_of(spark, "q34_customer_order_gaps")
    assert count("Exchange hashpartitioning", plan) == 1


def test_q36_has_no_unpartitioned_window(spark):
    """VERDICT r5 item 2: the NTILE/PERCENT_RANK distribution must never
    plan a no-partition WindowExec (one task for the whole customer
    dimension). The distributed-rank rewrite's only window partitions on
    the 32-value range bucket; the tiny prefix-sum/percentile aggregates
    may SinglePartition-exchange a handful of rows, but no window runs
    unpartitioned."""
    import re

    plan = plan_of(spark, "q36_spend_deciles")
    # the partition spec is the text between 'windowspecdefinition(' and
    # the order-by / frame markers — checking the whole line would pass a
    # plan that merely PROJECTS __rb next to an unpartitioned window
    # (ADVICE r6: the old line-level check was tautological)
    specs = re.findall(
        r"windowspecdefinition\((.*?)(?:ASC NULLS|DESC NULLS|"
        r"specifiedwindowframe)",
        plan,
    )
    assert specs, "expected at least one window (the bucket window)"
    for spec in specs:
        # the capture's LAST comma-separated element is the first ORDER
        # BY column (its direction keyword was the regex terminator) —
        # only the elements before it are partition columns. Without the
        # drop, a window partitioned on NOTHING but ordered by __rb
        # would pass (r7 review).
        partition_cols = [p.strip() for p in spec.split(",")][:-1]
        assert any("__rb#" in p for p in partition_cols), (
            f"window not partitioned on the range bucket: "
            f"windowspecdefinition({spec[:160]}"
        )


def test_q36_small_n_matches_ntile_exactly(spark, tmp_path):
    """The NTILE fill arithmetic must match Spark's own ntile() on an
    n < tiles input (base = 0: every tile holds at most one row) and on
    an uneven n — the branches the parquet fixtures (n >= 150) never
    exercise."""
    import pyspark.sql.functions as SF
    from pyspark.sql import Window as W

    import __spark_entry__ as entrymod

    for n_cust in (7, 23):
        rows = [
            (i % n_cust + 1, i, float(((i * 37) % 100) + 1))
            for i in range(n_cust * 3)
        ]
        df = spark.createDataFrame(
            rows, "o_custkey long, o_orderkey long, o_totalprice double"
        )
        d = tmp_path / f"sf_tiny_{n_cust}"
        d.mkdir()
        df.coalesce(1).write.parquet(str(d / "orders.parquet"))
        got = {
            r["custkey"]: (r["decile"], r["pct_rank"])
            for r in entrymod.queries()["q36_spend_deciles"](
                spark, str(d)
            ).collect()
        }
        from liq_stream_spark.plans.tables import dsum, load

        spend = (
            load(spark, str(d), "orders")
            .groupBy(SF.col("o_custkey").alias("custkey"))
            .agg(dsum("o_totalprice").alias("total_spend"))
        )
        w = W.orderBy(SF.desc("total_spend"), SF.asc("custkey"))
        want = {
            r["custkey"]: (r["d"], r["p"])
            for r in spend.select(
                "custkey",
                SF.ntile(10).over(w).cast("long").alias("d"),
                SF.percent_rank().over(w).alias("p"),
            ).collect()
        }
        assert got == want


def test_q38_funnel_rides_one_key(spark):
    # every join/agg in the funnel keys on user_id; no cartesian, no
    # nested loop, no sort-merge fallbacks forced by mismatched keys
    plan = plan_of(spark, "q38_event_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d07_cluster_sets_broadcast_back(spark):
    # the corpus-side joins against the (tiny) drop/keep cluster sets are
    # broadcast, so the corpus is never shuffled for the survivor stitch
    plan = plan_of(spark, "d07_dedup_survivors")
    assert count("BroadcastHashJoin", plan) >= 2
    assert "CartesianProduct" not in plan


def test_p06_prefix_sum_is_distributed(spark):
    """The packing map's running offset must never serialize onto one
    task: every window Exchange partitions on the md5 bucket (or the
    256-row bucket-total side), NOT SinglePartition over the corpus."""
    plan = plan_of(spark, "p06_pack_offsets")
    # the doc-level window runs over hashpartitioning(__b)
    assert "hashpartitioning" in plan
    # SinglePartition may appear only for the 256-row bucket-offset window;
    # the corpus-side window must not be under it: check that the FileScan
    # feeding a SinglePartition exchange projects only bucket totals
    for seg in plan.split("Exchange SinglePartition")[1:]:
        # segment after the exchange shows its child; corpus scans carry
        # the text column, the bucket-total side never does
        child = seg.split("Exchange")[0]
        assert "text#" not in child


def test_p07_chunks_are_shuffle_free(spark):
    plan = plan_of(spark, "p07_doc_chunks")
    assert "Exchange" not in plan and "Join" not in plan


@pytest.mark.parametrize(
    "name", ["t08_pii_redaction", "t09_line_quality_filter"]
)
def test_per_row_projections_are_shuffle_free(spark, name):
    plan = plan_of(spark, name)
    assert "Exchange" not in plan and "Join" not in plan


def test_s07_pq_adc_broadcasts_never_cross_joins(spark):
    """ADC scoring joins corpus codes against the broadcast query table on
    (s, code) — no cartesian products, no sort-merge over raw vectors."""
    plan = plan_of(spark, "s07_pq_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_d09_gram_join_no_cross_join(spark):
    plan = plan_of(spark, "d09_duplicate_ngrams")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d11_pairs_never_leave_a_cell(spark):
    """SemDeDup's quadratic term must be cell-bounded: no cartesian
    products — the candidate self-join keys on cell (equi), and the
    k-means assignment runs ONCE (localCheckpoint) instead of once per
    consumer, so no BroadcastNestedLoopJoin survives into the final
    plan either."""
    plan = plan_of(spark, "d11_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair join is an equi-join keyed on cell
    joins = [l for l in plan.splitlines()
             if "SortMergeJoin" in l or "ShuffledHashJoin" in l
             or "BroadcastHashJoin" in l]
    assert any("cell" in l for l in joins)


def test_t10_topk_never_sorts_full_vocab(spark):
    plan = plan_of(spark, "t10_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_liq_cascades_event_windows_are_bucketed(spark):
    """The cascade sessionization must be the two-phase hot-key-safe
    shape: every window that runs over EVENT rows partitions on
    (exchange, symbol, __b) — a hot symbol parallelizes across hour
    buckets — and per-(exchange, symbol)-only windows run only above the
    session-level boundary merge, never over raw events."""
    plan = plan_of(spark, "liq_cascades")
    event_windows = [
        seg
        for seg in plan.splitlines()
        if "Window" in seg and "windowspecdefinition" in seg
        and "__ts" in seg  # event-level: orders by the event timestamp
    ]
    assert event_windows, "expected event-level window operators"
    for seg in event_windows:
        assert "__b" in seg.split("windowspecdefinition")[1].split(")")[0] or (
            "__b" in seg
        ), f"event-level window not bucket-partitioned: {seg[:200]}"
    # the session_id helper window (row_number over session_start) is
    # dropped by column pruning — liq_cascades doesn't select it
    assert not [
        seg
        for seg in plan.splitlines()
        if "row_number" in seg and "session_start" in seg
    ]


def test_d10_corpus_never_reshuffles_for_ingest(spark):
    """Incremental dedup: the new batch broadcasts into both probes —
    no cartesian/nested-loop joins, and the join of corpus band keys
    against the batch is a BroadcastHashJoin."""
    plan = plan_of(spark, "d10_incremental_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert count("BroadcastHashJoin", plan) >= 3  # near probe + exact + flags


def test_bench_headline_names_resolve():
    """bench.py's HEADLINE list must stay in sync with the registry —
    the external harness runs bench.py blind, so a rename that breaks a
    headline query would only surface as a missing BENCH record."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from liq_stream_spark.plans import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_q43_lateral_is_decorrelated_to_group_limit(spark):
    # the per-customer LATERAL subquery must NOT execute per row: Catalyst
    # decorrelates it into a rank/WindowGroupLimit + ONE join — q07's shape
    plan = plan_of(spark, "q43_lateral_topn")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") >= 1


def test_q44_gap_fill_is_one_window_shuffle(spark):
    plan = plan_of(spark, "q44_gap_fill")
    # one Exchange (hash on user_id) + in-partition sort; no join at all
    assert count("Exchange", plan) == 1
    assert "Join" not in plan


def test_t13_lm_join_shapes(spark):
    plan = plan_of(spark, "t13_lm_perplexity")
    # the single-row vocab is the only nested-loop side; the model joins
    # are equi (SMJ/BHJ), never cartesian
    assert "CartesianProduct" not in plan


def test_t14_inference_is_shuffle_free(spark):
    # r13 model-as-literal rewrite: the weight array is a plan constant
    # and the dot product an in-row aggregate — no exchange, no join
    plan = plan_of(spark, "t14_quality_classifier")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_g01_pagerank_rounds_are_equi_joins(spark):
    plan = plan_of(spark, "g01_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_p10_thresholds_never_sort_the_corpus(spark):
    # bucketing must ride ONE percentile aggregate broadcast back over
    # the scores — no global sort, no single-partition Window
    plan = plan_of(spark, "p10_perplexity_buckets")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_p11_cap_prunes_map_side(spark):
    # row_number()<=K must plan as WindowGroupLimit: a hot source ships
    # K rows per map partition, not its whole posting list
    plan = plan_of(spark, "p11_source_caps")
    assert "WindowGroupLimit" in plan
    assert count("Exchange", plan) == 1  # the source hash partitioning


def test_t15_gopher_gate_is_shuffle_free(spark):
    plan = plan_of(spark, "t15_gopher_rules")
    assert count("Exchange", plan) == 0
    assert "Join" not in plan


def _assert_event_windows_bucketed(plan: str, name: str) -> None:
    """Every window operator that runs over EVENT rows (orders by the
    event timestamp + tiebreak) must partition on (key, __b) — the
    bounded_window two-phase shape — so no 5-value hot key ever
    serializes its history into one task. Bucket-LEVEL windows (order
    by __b, span/bucket rows per key) are the intended small second
    phase and are exempt."""
    event_windows = [
        seg
        for seg in plan.splitlines()
        if "windowspecdefinition" in seg and " ts#" in seg
    ]
    assert event_windows, f"{name}: expected event-level window operators"
    for seg in event_windows:
        assert "__b#" in seg, (
            f"{name}: event-level window not bucket-partitioned: {seg[:200]}"
        )


@pytest.mark.parametrize(
    "name", ["q45_twap", "q47_anomaly_zscore", "q50_ewma"]
)
def test_hot_key_windows_are_bucketed(spark, name):
    """VERDICT r5 item 1: the event_type-keyed bounded windows must run
    the two-phase bucketed shape (operators/bounded_window) — no window
    over raw events partitioned on the 5-value key alone."""
    _assert_event_windows_bucketed(plan_of(spark, name), name)


def test_d18_winnow_pairs_no_cross_join(spark):
    plan = plan_of(spark, "d18_winnow_clone_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_g02_triangles_are_equi_joins(spark):
    plan = plan_of(spark, "g02_triangle_counts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_p12_grouping_sets_single_expand_agg(spark):
    plan = plan_of(spark, "p12_corpus_report")
    assert "Expand" in plan
    assert "Join" not in plan


def test_s12_centroids_single_combinable_agg(spark):
    # posexplode -> ONE (label, pos) partial-agg shuffle; no join, no window
    plan = plan_of(spark, "s12_label_centroids")
    assert count("Exchange", plan) == 1
    assert "Join" not in plan and "Window" not in plan


def test_q46_cohorts_ride_user_key(spark):
    plan = plan_of(spark, "q46_retention_cohorts")
    assert "CartesianProduct" not in plan


def test_d19_containment_no_cross_join(spark):
    plan = plan_of(spark, "d19_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q47_zscore_carry_join_is_broadcast(spark):
    """Post-bucketing shape (r6): the only join is the tiny bucket-level
    carry BROADCAST back onto events — never a sort-merge of event-sized
    sides — and the tail branch collects at most P rows per bucket (the
    whole-bucket collect_list would buffer an entire 100 TB bucket in
    one agg buffer). Bucketed event windows are pinned separately in
    test_hot_key_windows_are_bucketed."""
    plan = plan_of(spark, "q47_anomaly_zscore")
    assert count("BroadcastHashJoin", plan) == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q48_scalar_subquery_is_decorrelated(spark):
    # the per-row correlated average must rewrite to one aggregate + join
    plan = plan_of(spark, "q48_above_nation_average")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_p13_split_never_separates_cluster_members(spark):
    # semantic gate, not a plan pin: every near-dup cluster lands in ONE split
    import __spark_entry__ as em

    df = em.queries()["p13_leakage_free_split"](spark, SF_DIR)
    from pyspark.sql import functions as F

    n_bad = (
        df.groupBy("rep_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_bad == 0


def test_q49_scd2_single_window_shuffle(spark):
    plan = plan_of(spark, "q49_scd2_history")
    assert count("Exchange", plan) == 1
    assert "Join" not in plan


def test_t16_entropy_no_data_joins(spark):
    # explode + two combinable aggs; only the docs-spine left join remains
    plan = plan_of(spark, "t16_unigram_entropy")
    assert "CartesianProduct" not in plan


def test_q50_ewma_carry_join_is_broadcast(spark):
    """Post-bucketing shape (r6): same contract as q47's pin — one
    broadcast carry join, no event-sized sort-merge, no cartesian."""
    plan = plan_of(spark, "q50_ewma")
    assert count("BroadcastHashJoin", plan) == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_p14_keeps_exactly_one_per_cluster(spark):
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    df = em.queries()["p14_quality_survivors"](spark, SF_DIR)
    per = (
        df.groupBy("rep_id")
        .agg(F.sum(F.col("is_kept").cast("int")).alias("n_kept"))
        .select(F.min("n_kept").alias("lo"), F.max("n_kept").alias("hi"))
        .collect()[0]
    )
    assert per["lo"] == 1 and per["hi"] == 1
    # the kept doc's score is the cluster max
    mx = df.groupBy("rep_id").agg(F.max("prob").alias("mx"))
    bad = (
        df.filter("is_kept")
        .join(mx, "rep_id")
        .filter(F.col("prob") < F.col("mx"))
        .count()
    )
    assert bad == 0


def test_q51_salted_join_spreads_hot_keys(spark):
    """The salted rewrite must actually execute as a shuffle join keyed on
    (event_type, hour, __salt) — no broadcast (which would bypass the
    skew problem being demonstrated) and no cartesian product."""
    plan = plan_of(spark, "q51_salted_skew_join")
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
    join_line = next(
        l for l in plan.splitlines()
        if "ShuffledHashJoin" in l or "SortMergeJoin" in l
    )
    assert "__salt" in join_line  # the salt is part of the join key


def test_shingle_udf_evaluates_once_per_plan(spark):
    """The Arrow gram/sign pass must appear at most ONCE in each plan
    (r7 audit): an inner (pos)explode lets Catalyst's
    InferFiltersFromGenerate add a size() > 0 filter BELOW the Generate,
    splitting the UDF into a filter evaluation plus a project evaluation
    (two full passes); multi-consumer subtrees without materialization
    re-ran it once per consumer (four times in d04/d19, EIGHT in d18).
    The outer-generate + localCheckpoint fixes pin to: <= 1
    ArrowEvalPython node per executed plan (0 when the pass is behind
    the one-time checkpoint scan)."""
    import re as _re

    for name in [
        "d02_minhash_signatures",
        "d03_minhash_lsh_pairs",
        "d04_ngram_jaccard_pairs",
        "d08_ngram_jaccard_capped",
        "d19_containment_pairs",
        "t12_winnowing_fingerprints",
        "d18_winnow_clone_pairs",
        "g02_triangle_counts",
    ]:
        plan = plan_of(spark, name)
        n = len(_re.findall("ArrowEvalPython", plan))
        assert n <= 1, f"{name}: {n} ArrowEvalPython nodes (duplicate UDF pass)"


def test_plans_md_is_fresh_at_head():
    """VERDICT r10 item 3: PLANS.md is the complete-survey artifact the
    pins in this file sample from — a REGISTRY builder changing after
    its generation makes the artifact silently stale (it happened twice:
    r9 and r10 both changed builders after the r8 regeneration). The
    generator now stamps the HEAD commit; this gate fails when commits
    touching liq_stream_spark/ postdate the stamp. Uncommitted
    working-tree changes are deliberately ignored (the gate rides
    commits, like the ledger's). Regenerate in its OWN commit right
    after plan-affecting code lands:
    `python -m liq_stream_spark.tools plans`."""
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parents[1]
    text = (root / "PLANS.md").read_text()
    m = re.search(r"Generated at commit ([0-9a-f]{7,40})\.", text)
    assert m, (
        "PLANS.md predates the freshness stamp — regenerate it: "
        "python -m liq_stream_spark.tools plans"
    )
    base = m.group(1)
    try:
        known = subprocess.run(
            ["git", "cat-file", "-e", f"{base}^{{commit}}"],
            cwd=root,
            capture_output=True,
        )
    except FileNotFoundError:
        pytest.skip("git unavailable")
    if known.returncode != 0:
        pytest.skip(f"stamped commit {base} unknown to this clone")
    drift = subprocess.run(
        ["git", "log", "--oneline", f"{base}..HEAD", "--",
         "liq_stream_spark/"],
        cwd=root,
        capture_output=True,
        text=True,
    )
    assert drift.returncode == 0, drift.stderr
    stale = [line for line in drift.stdout.splitlines() if line.strip()]
    assert not stale, (
        "PLANS.md is STALE — these commits touch liq_stream_spark/ after "
        "its generation stamp; regenerate it (python -m "
        "liq_stream_spark.tools plans) in its own commit:\n"
        + "\n".join(stale[:10])
    )
