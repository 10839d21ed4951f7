"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row whose time is <= (backward,
inclusive) the left row's time, within equal join keys.

Implementation is the scalable union-sort trick, not a per-key
``pd.merge_asof`` shuffle into Python:

1. union left (tagged) and right rows into one keyed, timed relation
2. one window per key ordered by (time, side) computes ``last(right
   payload, ignorenulls=True)`` up to the current row
3. keep the left rows, now carrying the as-of-matched right payload

Cost: ONE shuffle on the join key (the window's partitioning), fully
JVM-side, no Python boundary. At 100 TB this behaves like a sort-merge
join: each key's timeline is sorted once within its partition; skewed keys
are handled by AQE the same way a skewed SMJ is. The alternative
(`applyInPandas` + merge_asof) moves every byte through Arrow+Python and
is kept only as a reference point in tests.

The reference has no joins at all (SURVEY.md §2.8); this is part of the
mandated extension surface (point-in-time enrichment of event streams,
e.g. liquidation events against a venue-state table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """Backward (inclusive) as-of join. ``on`` = equality key(s);
    ``how`` in {"left","inner"}: keep unmatched left rows or drop them.
    Right columns (except keys/time) are attached verbatim; name clashes
    with left columns get ``suffix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: unsupported how={how!r}")

    lcols = [c for c in left.columns]
    rpayload = [c for c in right.columns if c not in keys and c != right_time]
    out_names = {
        c: (c + suffix if c in lcols else c) for c in rpayload
    }

    # one struct carries the whole right payload so a single last() suffices
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__rp"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lp"),
    )
    r = r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType))

    unioned = l.unionByName(r)
    # right rows sort before left rows at equal time -> inclusive (<=) match;
    # the payload struct is the final sort key so ties between right rows at
    # the same (key, time) resolve deterministically (largest payload wins)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__rp").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rp", ignorenulls=True).over(w))

    out = matched.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        *[F.col(f"__lp.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__match.{c}").alias(out_names[c])
            for c in rpayload
        ],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    bucket: int,
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """Hot-key-safe as-of join: the two-phase "salted" variant of
    :func:`asof_join` for skewed key distributions.

    ``asof_join``'s single window partitions by key alone, so one hot key
    (e.g. one symbol carrying 30% of a 100 TB feed) becomes one straggler
    task — AQE splits skewed *joins*, not window partitions. This variant
    salts the window with time: rows are bucketed by
    ``floor(time / bucket)`` and the timeline of a hot key is processed as
    one task per bucket instead of one task total.

    Phase 1 (carry): per (key, bucket) the latest right (time, payload) is
    aggregated — map-side combinable, so the shuffle carries ~one row per
    (key, bucket) — and a running ``last`` over the tiny per-key bucket
    summary yields the carry-in: the latest right payload from any EARLIER
    bucket.
    Phase 2 (local): the original window runs partitioned by
    (key, bucket); a left row that finds no in-bucket match falls back to
    the broadcast-joined carry-in. Identical output to ``asof_join`` for
    any ``bucket`` (equivalence-tested), including the deterministic
    right-tie rule (largest (time, payload) wins).

    Pick ``bucket`` so a hot key's densest bucket fits a task comfortably
    (e.g. 1h of the hottest symbol); more buckets = more (small) carry
    rows, never more total data shuffled."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join_bucketed: unsupported how={how!r}")
    if bucket <= 0:
        raise ValueError("bucket must be a positive time span")

    lcols = list(left.columns)
    rpayload = [c for c in right.columns if c not in keys and c != right_time]
    out_names = {c: (c + suffix if c in lcols else c) for c in rpayload}

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__rp"),
    ).withColumn("__b", F.floor(F.col("__t") / F.lit(bucket)))
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lp"),
    ).withColumn("__b", F.floor(F.col("__t") / F.lit(bucket)))
    r = r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType))

    # phase 1: latest right per (key, bucket) — the tie rule mirrors the
    # window's orderBy (__t, then payload), via max of the (t, payload) pair
    summary = r.groupBy(*keys, "__b").agg(
        F.max(F.struct(F.col("__t"), F.col("__rp"))).alias("__latest")
    )
    # buckets that appear on either side need a carry value
    all_buckets = (
        l.select(*keys, "__b").unionByName(r.select(*keys, "__b")).distinct()
    )
    wb = (
        W.partitionBy(*keys)
        .orderBy(F.col("__b").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(summary, [*keys, "__b"], "left")
        .withColumn("__carry", F.last("__latest.__rp", ignorenulls=True).over(wb))
        .select(*keys, "__b", "__carry")
    )

    # phase 2: the asof window, now bounded per (key, bucket)
    unioned = l.unionByName(r)
    w = (
        W.partitionBy(*keys, "__b")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__rp").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn(
        "__local", F.last("__rp", ignorenulls=True).over(w)
    )
    out = (
        matched.filter(F.col("__side") == 1)
        .join(carry, [*keys, "__b"], "left")
        .withColumn("__match", F.coalesce(F.col("__local"), F.col("__carry")))
    )
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        *[F.col(f"__lp.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in rpayload],
    )
