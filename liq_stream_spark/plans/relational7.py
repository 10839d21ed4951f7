"""Seventh tranche: shuffle-skew remedies. The events table's join keys
are deliberately hot (5 event types), which is the shape that breaks
naive shuffle joins at 100 TB — these queries exercise the explicit
salting rewrite (operators/skew.salted_join) and pin its plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import dsum, load

_Q51_SALTS = 8


@register(
    "q51_salted_skew_join",
    """
    WITH ev AS (
      SELECT event_id, event_type, date_trunc('hour', ts) AS hour, value
      FROM events
    ),
    st AS (
      SELECT event_type, hour,
             CAST(COUNT(*) AS BIGINT) AS n_same_hour,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
               AS total_value_same_hour
      FROM ev GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type, e.hour,
           st.n_same_hour, st.total_value_same_hour
    FROM ev e JOIN st USING (event_type, hour)
    """,
    doc="skew-salted shuffle join (operators/skew.salted_join): every "
    "event is enriched with its (event_type, hour) cohort stats through "
    "a join whose key has only 5 distinct event types — the hot-key "
    "histogram that serializes a naive shuffle join at 100 TB (one "
    "task per key). The left side gets a deterministic xxhash64 salt "
    "in [0, 8), the stats side is replicated once per salt, and the "
    "join runs on (key, salt), spreading each hot key over 8 shuffle "
    "partitions while producing the IDENTICAL result set to the plain "
    "join (each pair meets at exactly one salt) — which is why the "
    "oracle is the unsalted SQL. The stats side is shuffle-hash-hinted "
    "so the salted-shuffle path executes even at fixture scale where "
    "Catalyst would broadcast (at scale, a types x hours spine over "
    "years of data outgrows broadcast). Plan pinned in "
    "tests/test_plans.py: join keys include __salt, no "
    "BroadcastHashJoin. See also AQE skew-join, which splits oversized "
    "partitions at runtime but cannot split a single key across "
    "matching-side partitions — in batch or in streaming micro-batches "
    "(where Spark 4's AQE does run; the streaming salted path is "
    "proven live in tests/test_streaming_joins.py).",
)
def q51_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    stats = (
        ev.groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_same_hour"),
            dsum("value").alias("total_value_same_hour"),
        )
        .hint("shuffle_hash")
    )
    return salted_join(
        ev,
        stats,
        on=["event_type", "hour"],
        n_salts=_Q51_SALTS,
        salt_cols=["event_id"],
    ).select(
        "event_id",
        "event_type",
        "hour",
        "n_same_hour",
        "total_value_same_hour",
    )
