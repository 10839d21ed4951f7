"""Streaming joins: stream-static enrichment and stream-stream interval
joins over the liquidation stream.

The reference has no joins at all (SURVEY.md §2.8) — these are the two
join shapes its downstream consumers would otherwise hand-roll:

- ``enrich_stream``: attach a static dimension (symbol metadata, venue
  config, instrument sector) to every streaming row. The dim is
  broadcast, so the stream never shuffles and no state store is
  involved — each micro-batch plans a BroadcastHashJoin exactly like
  the batch q03 shape. At cluster scale refresh-by-restart (or a Delta
  dim re-read per trigger) is the standard pattern; the join itself is
  stateless.

- ``interval_join_streams``: correlate two live streams (e.g.
  liquidations vs mark-price ticks) on a key within a bounded
  event-time window. Both sides carry watermarks and the join predicate
  carries the time-range condition — that pair is what lets Spark
  expire buffered state instead of holding both streams forever
  (state per side is bounded by watermark + range). Inner matches emit
  eagerly; the watermark only gates state cleanup (and outer-side
  nulls, if used with outer joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    salt_n: int | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment. Default: broadcast the (small) dimension
    onto the unbounded stream — stateless, safe in any output mode.

    ``salt_n``: the NON-broadcastable-dim variant. When the dimension is
    too large to broadcast AND the stream's join key has hot values (a
    few symbols dominating the tape), each micro-batch's shuffle join
    serializes every hot key into one task — AQE runs inside Spark 4
    micro-batches, but its skew split divides oversized PARTITIONS, not
    a single key, and its coalescing can even merge the key's rows back
    together. Routing
    through :func:`liq_stream_spark.operators.skew.salted_join` spreads
    each hot key over ``salt_n`` shuffle partitions per micro-batch
    (identical result set; the salt is deterministic xxhash64 over
    ``salt_cols``, so task retries re-derive it — safe under
    exactly-once sinks). Proven live in
    tests/test_streaming_joins.py::test_salted_enrichment_spreads_hot_key_in_microbatch.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt_n is None:
        return stream.join(F.broadcast(dim), keys, how)
    from liq_stream_spark.operators.skew import salted_join

    return salted_join(
        stream, dim, on=keys, n_salts=salt_n, how=how, salt_cols=salt_cols
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    left_watermark: str = "1 minute",
    right_watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join:

    match left and right rows with equal ``on`` keys where
    ``right_ts`` lies in [left_ts - lower_seconds, left_ts + upper_seconds].

    Both inputs must be streaming DataFrames with event-time timestamp
    columns; watermarks bound the buffered state on each side (Spark
    drops buffered rows once the other side's watermark passes the
    range edge). The equality key keeps the join an equi-shuffle on
    ``on`` — the range condition only prunes within matched key groups,
    so the plan survives scale the same way the batch interval join
    (q32) does.

    ``how="leftOuter"``/``"rightOuter"``: the unmatched side emits
    null-padded ONLY once the watermark proves no in-window match can
    still arrive — the streaming analog of a batch outer join, with
    emission delayed by watermark + range."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    lcol = F.col(f"__l.{left_ts}")
    rcol = F.col(f"__r.{right_ts}")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (rcol >= lcol - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rcol <= lcol + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return lw.alias("__l").join(rw.alias("__r"), cond, how)
