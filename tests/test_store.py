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
