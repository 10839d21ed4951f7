"""Streaming document deduplication — the §2.8 dedup family under
Structured Streaming (batch/stream unification: the SAME hash/signature
expressions as the batch operators, wrapped in watermark-bounded keyed
state).

- exact: key = sha256(text). Byte-identical re-submissions are dropped
  while inside the watermark.
- simhash: key = the 64-bit SimHash signature (text.simhash64_fast, the
  zero-shuffle Arrow projection). Documents whose signatures COLLIDE are
  dropped — token-order permutations and token-multiset-preserving edits
  map to the same signature, so this catches a class of near-duplicates
  exact hashing misses, with deterministic single-key state (no pairwise
  scoring in-stream; pair-precise near-dup remains the batch operators'
  job).

State is watermark-bounded (RocksDB on a cluster) — the streaming analog
of running dedup_exact/simhash_near_pairs over a growing corpus without
unbounded memory."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from liq_stream_spark.operators.text import simhash64_fast


def _dedup_on_key(
    docs: DataFrame, key, ts_col: str, watermark: str
) -> DataFrame:
    return (
        docs.withColumn("__k", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__k"])
        .drop("__k")
    )


def dedup_docs_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop byte-identical documents within the watermark."""
    return _dedup_on_key(
        docs, F.sha2(F.col(text_col), 256), ts_col, watermark
    )


def dedup_docs_simhash(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop documents whose 64-bit SimHash signature collides within the
    watermark (token-order/multiset-equivalent near-dups)."""
    return _dedup_on_key(docs, simhash64_fast(text_col), ts_col, watermark)
