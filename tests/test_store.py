"""Store layout: compaction produces partitioned+sorted parquet and reads
are partition-pruned."""

from pyspark.sql import functions as F

from liq_stream_spark.plans.liquidations import unified_liquidations
from liq_stream_spark.store import compact_store, read_store


def test_compact_and_pruned_read(spark, tmp_path):
    src = str(tmp_path / "append")
    dst = str(tmp_path / "compacted")
    liq = unified_liquidations(spark)
    # simulate a streaming append dir: many small writes
    for i in range(3):
        from liq_stream_spark.sinks import with_date

        with_date(liq).write.mode("append").parquet(src)

    compact_store(spark, src, dst)
    whole = spark.read.parquet(dst)
    assert whole.count() == liq.count() * 3
    # layout: partition dirs exist
    dirs = {p.name for p in (tmp_path / "compacted").iterdir() if p.is_dir()}
    assert any(d.startswith("exchange=") for d in dirs)

    # pruned read returns only the partition, and the predicate reaches the
    # scan as a PartitionFilter (never a post-scan filter)
    okx = read_store(spark, dst, exchange="okx")
    assert okx.count() == 4 * 3
    plan = okx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "okx" in plan

    # within-partition sort: rows per file are ordered by (symbol, ts)
    one = okx.select("symbol", "ts_exch_ms").collect()
    assert len(one) == 12


def test_export_daily_csv_reference_layout(spark, tmp_path):
    """The bridge export reproduces the reference's CSV contract
    (writer_csv.py:7-21): liquidations_YYYY-MM-DD.csv naming, one header,
    reference column order, csv-module quote doubling on the raw JSON."""
    import csv

    from liq_stream_spark.sinks import with_date
    from liq_stream_spark.store import CSV_SCHEMA, export_daily_csv

    store = str(tmp_path / "lake")
    liq = unified_liquidations(spark)
    with_date(liq).write.mode("append").partitionBy(
        "exchange", "market", "date"
    ).parquet(store)

    outdir = str(tmp_path / "csv")
    files = export_daily_csv(spark, store, outdir)
    assert files, "no days exported"
    assert all(f.split("/")[-1].startswith("liquidations_") for f in files)

    n_rows = 0
    for f in files:
        with open(f, newline="", encoding="utf-8") as fh:
            rows = list(csv.DictReader(fh))
        n_rows += len(rows)
        assert list(rows[0].keys()) == CSV_SCHEMA
        # raw JSON survives the quote/escape round-trip intact
        import json

        for r in rows:
            if r["raw"]:
                json.loads(r["raw"])
    assert n_rows == liq.count()


def test_band_index_bucketed_join_has_no_shuffle(spark, tmp_path):
    """The bucketed dedup index must (a) reproduce d03's candidate pairs
    exactly and (b) plan its self-join with ZERO Exchange beneath the
    join — the storage layout replaces the per-run corpus shuffle."""
    from liq_stream_spark.operators.dedup import (
        lsh_candidate_pairs_banded,
        minhash_sig_arrays,
    )
    from liq_stream_spark.store import (
        band_collision_pairs_from_index,
        write_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = "band_index_test"
    try:
        write_band_index(docs, table, str(tmp_path / "band_index"))
        expected = {
            tuple(r)
            for r in lsh_candidate_pairs_banded(
                minhash_sig_arrays(docs), max_bucket=None
            ).collect()
        }
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            pairs_df = band_collision_pairs_from_index(spark, table)
            plan = pairs_df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # the ONLY exchange is the distinct-pairs agg ABOVE the join;
            # everything under the join reads co-located buckets
            join_part = plan.split("SortMergeJoin", 1)[1]
            assert "Exchange" not in join_part, join_part[:400]
            assert plan.count("Exchange") == 1
            got = {tuple(r) for r in pairs_df.collect()}
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", old_thresh
            )
        assert got == expected and got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_fact_join_has_no_shuffle(spark, tmp_path):
    """write_bucketed_table must let the lineitem x orders equi-join plan
    with ZERO Exchange beneath the SortMergeJoin (q41's claim): the fact
    shuffle is paid once at write time, not per query."""
    from liq_stream_spark.store import write_bucketed_table

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li_t, o_t = "li_bucketed_test", "orders_bucketed_test"
    try:
        write_bucketed_table(
            li, li_t, str(tmp_path / "li"), 8, ["l_orderkey"], ["l_orderkey"]
        )
        write_bucketed_table(
            orders, o_t, str(tmp_path / "o"), 8, ["o_orderkey"], ["o_orderkey"]
        )
        a, b = spark.table(li_t), spark.table(o_t)
        joined = a.hint("merge").join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:400]
        assert plan.count("Bucketed: true") == 2
        # same rows as the plain shuffle join
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li_t}")
        spark.sql(f"DROP TABLE IF EXISTS {o_t}")


def test_compact_band_index_folds_files_and_keeps_layout(spark, tmp_path):
    """VERDICT r9 item 3: append x N -> compact_band_index folds the
    per-append bucket files back to ONE per bucket, candidate pairs are
    identical before and after, the self-join still plans with zero
    Exchange beneath it (the catalog's bucket spec never changed), the
    sidecars are carried across the swap, and a further append still
    works."""
    import glob
    import os

    from liq_stream_spark import store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = "band_compact_test"
    p = str(tmp_path / "bandc")
    try:
        store.write_band_index(docs.filter(F.col("doc_id") < 250), t, p)
        for lo, hi in ((250, 350), (350, 450), (450, 500)):
            store.append_to_band_index(
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
                t,
                p,
            )
        want = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(spark, t).collect()
        }
        n_buckets = 64  # write_band_index default
        assert len(glob.glob(f"{p}/part-*")) > n_buckets, (
            "appends should have left multiple files per bucket"
        )
        ids_files_before = len(glob.glob(f"{p}/_ids/*.parquet"))
        assert ids_files_before > 1
        store.compact_band_index(spark, t, p)
        assert len(glob.glob(f"{p}/part-*")) == n_buckets
        # sidecars survived the swap; the ids sidecar FOLDED (rewritten
        # sorted, not file-copied), content intact
        assert os.path.isfile(f"{p}/_liq_index_meta.json")
        assert len(glob.glob(f"{p}/_ids/*.parquet")) < ids_files_before
        assert spark.read.parquet(f"{p}/_ids").count() == docs.count()
        got = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(spark, t).collect()
        }
        assert got == want and got
        # zero Exchange beneath the self-join, post-compaction (d15 pin)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                store.band_collision_pairs_from_index(spark, t)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, join_part[:400]
        # guards intact after the swap: dup refuses, fresh appends work
        import pytest

        with pytest.raises(ValueError, match="already present"):
            store.append_to_band_index(docs.limit(3), t, p)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_band_index_guards_path_table_mismatch(spark, tmp_path):
    """ADVICE r9 (store.py:276): an append or compaction handed a
    (table, path) pair that don't belong together must refuse — the
    sidecar at the wrong path describes a different hash family."""
    import pytest

    from liq_stream_spark import store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t1, t2 = "band_mismatch_a", "band_mismatch_b"
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    try:
        store.write_band_index(docs.filter(F.col("doc_id") < 100), t1, p1)
        store.write_band_index(
            docs.filter(F.col("doc_id") < 100), t2, p2, bands=2,
            rows_per_band=8,
        )
        batch = docs.filter(F.col("doc_id") >= 400)
        with pytest.raises(ValueError, match="mismatch"):
            store.append_to_band_index(batch, t1, p2)
        with pytest.raises(ValueError, match="mismatch"):
            store.compact_band_index(spark, t1, p2)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_band_ids_sidecar_invisible_to_table_scan(spark, tmp_path):
    """The _ids membership sidecar lives INSIDE the band table's
    location: the underscore prefix keeps it hidden from the table's
    file listing (same rule Spark applies to _SUCCESS/_metadata) while
    staying directly readable as parquet — both halves pinned because
    the append guard depends on the second and the table's correctness
    on the first."""
    from liq_stream_spark import store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t, p = "band_sidecar_test", str(tmp_path / "bandi")
    try:
        store.write_band_index(docs, t, p)
        keys = spark.table(t)
        assert set(keys.columns) == {"doc_id", "band", "band_key"}
        ids = spark.read.parquet(f"{p}/_ids")
        assert ids.columns == ["id"]
        assert ids.count() == docs.count()
        # the band-keys row count is bands x corpus — the scan never
        # swallowed the sidecar's differently-shaped rows
        assert keys.count() % docs.count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_band_index_append_matches_full_build(spark, tmp_path):
    """r9 incremental ingest, text side: build the band index on half
    the corpus, append the other half — candidate pairs are identical
    to a full-corpus build (the MinHash family and banding come from
    the stored meta, so appended keys collide correctly with stored
    ones), and the self-join STILL plans with zero Exchange beneath it
    (bucketed appends add files per bucket, never break the layout)."""
    import pytest

    from liq_stream_spark import store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half_a = docs.filter(F.col("doc_id") < 250)
    half_b = docs.filter(F.col("doc_id") >= 250)
    inc_t, full_t = "band_append_inc", "band_append_full"
    try:
        store.write_band_index(half_a, inc_t, str(tmp_path / "inc"))
        store.append_to_band_index(half_b, inc_t, str(tmp_path / "inc"))
        store.write_band_index(docs, full_t, str(tmp_path / "full"))
        got = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(
                spark, inc_t
            ).collect()
        }
        want = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(
                spark, full_t
            ).collect()
        }
        assert got == want and got
        # the appended table still joins without re-shuffling the corpus
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                store.band_collision_pairs_from_index(spark, inc_t)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, join_part[:400]
        # guards: re-appending indexed ids refuses; so does a
        # meta-less (pre-r9) table
        with pytest.raises(ValueError, match="already present"):
            store.append_to_band_index(
                half_b.limit(5), inc_t, str(tmp_path / "inc")
            )
        import os

        os.remove(str(tmp_path / "inc" / "_liq_index_meta.json"))
        with pytest.raises(ValueError, match="meta sidecar"):
            store.append_to_band_index(
                half_b, inc_t, str(tmp_path / "inc")
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {inc_t}")
        spark.sql(f"DROP TABLE IF EXISTS {full_t}")


def test_register_band_index_reattaches_without_rebuild(spark, tmp_path):
    """A session restart loses the in-memory catalog entry but not the
    bucketed files: register_band_index recreates the external-table
    entry from the meta sidecar alone — identical candidate pairs, the
    zero-Exchange self-join pin intact, and the append path still works
    against the re-attached table. Guards: a name collision with a
    DIFFERENT root refuses; a meta-less root refuses; an ANN (non-band)
    root refuses."""
    import os

    import pytest

    from liq_stream_spark import store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half_a = docs.filter(F.col("doc_id") < 250)
    half_b = docs.filter(F.col("doc_id") >= 250)
    table = "band_reattach"
    path = str(tmp_path / "band")
    try:
        store.write_band_index(half_a, table, path)
        want = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(
                spark, table
            ).collect()
        }
        # simulate the fresh session: catalog entry gone, files survive
        spark.sql(f"DROP TABLE {table}")
        assert os.path.isdir(path)
        store.register_band_index(spark, table, path)
        got = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(
                spark, table
            ).collect()
        }
        assert got == want and got
        # re-registering is an idempotent no-op
        store.register_band_index(spark, table, path)
        # the zero-Exchange self-join survives re-attachment
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                store.band_collision_pairs_from_index(spark, table)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, join_part[:400]
        # incremental ingest works against the re-attached entry and
        # matches a from-scratch full build
        store.append_to_band_index(half_b, table, path)
        got2 = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(
                spark, table
            ).collect()
        }
        store.write_band_index(docs, "band_reattach_full", str(tmp_path / "f"))
        full = {
            tuple(r)
            for r in store.band_collision_pairs_from_index(
                spark, "band_reattach_full"
            ).collect()
        }
        assert got2 == full
        # name collision with a DIFFERENT root: refused, entry untouched
        with pytest.raises(ValueError, match="DIFFERENT"):
            store.register_band_index(spark, table, str(tmp_path / "f"))
        # meta-less root: refused
        bare = tmp_path / "bare"
        bare.mkdir()
        with pytest.raises(ValueError, match="meta sidecar"):
            store.register_band_index(spark, "band_bare", str(bare))
        # an ANN root (meta without banding params): refused
        vecs = spark.createDataFrame(
            [(i, [float(i), float(i + 1)]) for i in range(32)],
            "id long, vec array<double>",
        )
        ann = str(tmp_path / "ann")
        store.write_ivf_index(vecs, ann, n_cells=2, iters=2,
                              id_col="id", vec_col="vec")
        with pytest.raises(ValueError, match="not a write_band_index"):
            store.register_band_index(spark, "band_ann", ann)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql("DROP TABLE IF EXISTS band_reattach_full")


def test_band_table_name_is_shared_and_sanitized():
    """ONE naming rule for band roots (ensure_band_index and `tools
    maintain` must always attach the same root under the same name),
    arbitrary basenames still yield a parseable SQL identifier, and —
    ADVICE r10 — the name carries a realpath hash so two different
    roots sharing a basename suffix can never collide on one catalog
    name (the full collision/symlink matrix lives in
    tests/test_index_store.py)."""
    import re

    from liq_stream_spark.store import band_table_name

    a = band_table_name("/x/bandidx-v1-97f65433")
    assert a == band_table_name("/x/bandidx-v1-97f65433/")
    assert a.startswith("band_index_97f65433_")
    for p in ("/data/my.band", "/data/plain"):
        n = band_table_name(p)
        assert re.match(r"^band_index_[A-Za-z0-9_]+_[0-9a-f]{8}$", n)
    assert band_table_name("/data/my.band").startswith("band_index_my_band_")
    # same suffix, different roots: distinct names
    assert band_table_name("/a/prod-x1") != band_table_name("/b/prod-x1")
