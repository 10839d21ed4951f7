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
