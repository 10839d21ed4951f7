"""Hyperliquid hour-file source.

The reference tails ``root/YYYYMMDD/HH`` hourly node-fill logs: backfill =
full-read all existing files sorted day-then-hour, live = poll-tail the
newest file (hyperliquid_adapter.py:68-101, :259-351).

Spark's file streaming source subsumes both modes: on the first trigger it
reads every existing file (backfill, S7), and each subsequent trigger picks
up newly created files (hour rollover, S8). In-place appends to the *current*
hour file have no Spark built-in — at file granularity the stream sees an
hour file once; a tiny tail→append-only-dir relay restores low latency if
needed (SURVEY.md §2.1 S8). At 100 TB scale the hourly layout is exactly a
date/hour-partitioned table, so the batch reader maps to a partitioned scan
with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.functions import now_ms

# root/YYYYMMDD/HH — day dirs are digits, hour files are digits 0..23
_GLOB = "/[0-9]*/[0-9]*"


def read_hl_hourly(
    spark: SparkSession, root: str, ingest_ms: int | None = None
) -> DataFrame:
    """Batch-read all hour files under root (backfill semantics,
    hyperliquid_adapter.py:341-348). Day-then-hour ordering is irrelevant to
    the set of rows produced; the dedup operator handles cross-file dups."""
    df = spark.read.text(root + _GLOB)
    stamp = F.lit(ingest_ms).cast("long") if ingest_ms is not None else now_ms()
    return df.withColumn("ts_ingest_ms", stamp)


def read_hl_hourly_stream(
    spark: SparkSession, root: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.text(root + _GLOB)
    return df.withColumn("ts_ingest_ms", now_ms())
