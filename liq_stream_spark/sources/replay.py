"""Replay sources: JSONL files of raw wire frames, one frame per line.

The reference consumes websocket frames record-at-a-time; the Spark rebuild's
batch/stream-unified normalizers take a DataFrame with one wire frame per row
in a ``value: string`` column. Reading as *text* (not ``spark.read.json``)
is deliberate: each venue frame is parsed with an explicit ``from_json``
schema inside the normalizer, exactly as the adapters call ``json.loads``
per frame (binance_adapter.py:117), and malformed frames become NULL rows to
filter, not job failures (PERMISSIVE semantics, SURVEY.md §2.3 F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.functions import now_ms


def read_jsonl_frames(
    spark: SparkSession, path: str, ingest_ms: int | None = None
) -> DataFrame:
    """Batch-read wire frames. ``ingest_ms`` pins ts_ingest_ms for
    deterministic replay tests; None stamps wall-clock at ingest
    (reference _now_ms, binance_adapter.py:59)."""
    df = spark.read.text(path)
    stamp = F.lit(ingest_ms).cast("long") if ingest_ms is not None else now_ms()
    return df.withColumn("ts_ingest_ms", stamp)


def read_jsonl_frames_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming variant: file-discovery per micro-batch. New JSONL files
    dropped into ``path`` are picked up on the next trigger — this is the
    dev/replay stand-in for the live websocket Python Data Sources."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.text(path)
    return df.withColumn("ts_ingest_ms", now_ms())
