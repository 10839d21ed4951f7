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
