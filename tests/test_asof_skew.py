"""Skew story for the window-heavy operators (ARCHITECTURE.md "Hot keys"):

- asof_join_bucketed must be output-EQUIVALENT to asof_join for any bucket
  width (real data + synthetic hot key with right-side ties), while its
  phase-2 window partitions on (key, time-bucket) — the hot key's timeline
  splits across tasks instead of becoming one straggler.
- sessionization's per-key partition sizes at sf0.1 are profiled to show
  the fixture keyspace is flat (the salting recipe is documented for when
  production keyspaces are not)."""

import pytest
from pyspark.sql import functions as F

from liq_stream_spark.operators.asof import asof_join, asof_join_bucketed


def _clicks_errors(spark):
    # events.ts is parquet TIMESTAMP_NTZ, which Spark refuses to cast
    # straight to long — go NTZ -> LTZ -> unix_micros (exact integers)
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", t_us.alias("t")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        t_us.alias("err_t"),
        F.col("event_id").alias("error_event_id"),
    )
    return clicks, errors


@pytest.mark.parametrize("bucket", [10**12, 3_600 * 10**9])
def test_bucketed_asof_equivalent_on_real_data(spark, bucket):
    clicks, errors = _clicks_errors(spark)
    base = {
        tuple(r)
        for r in asof_join(
            clicks, errors, "user_id", "t", "err_t"
        ).collect()
    }
    bucketed = {
        tuple(r)
        for r in asof_join_bucketed(
            clicks, errors, "user_id", "t", "err_t", bucket=bucket
        ).collect()
    }
    assert bucketed == base and len(base) > 0


def test_bucketed_asof_hot_key_with_ties(spark):
    """One key holds 90% of rows; right-side ties at equal times must
    resolve identically (largest payload wins) across bucket boundaries."""
    left = spark.createDataFrame(
        [("hot", t) for t in range(0, 500, 1)]
        + [("cold", t) for t in range(0, 50, 1)],
        "k string, t long",
    )
    right = spark.createDataFrame(
        # ties: two right rows at every 10th tick for the hot key
        [("hot", t, f"v{t}a") for t in range(0, 500, 10)]
        + [("hot", t, f"v{t}b") for t in range(0, 500, 10)]
        + [("cold", 25, "c")],
        "k string, rt long, payload string",
    )
    base = {
        tuple(r)
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }
    for bucket in (7, 100, 10_000):  # boundary-heavy, medium, single-bucket
        bucketed = {
            tuple(r)
            for r in asof_join_bucketed(
                left, right, "k", "t", "rt", bucket=bucket
            ).collect()
        }
        assert bucketed == base, f"bucket={bucket}"
    # phase-2 window really is salted: partition count for the hot key
    # at bucket=7 is ceil(500/7) buckets, each a separate window partition
    counts = (
        left.filter(F.col("k") == "hot")
        .groupBy(F.floor(F.col("t") / 7).alias("b"))
        .count()
        .collect()
    )
    assert len(counts) == 72 and max(r["count"] for r in counts) <= 7


@pytest.mark.parametrize("bucket_s", [3_600, 6 * 3_600, 86_400])
def test_bucketed_sessionize_equivalent_on_real_data(spark, bucket_s):
    """sessionize_bucketed == sessionize on the events fixture for every
    bucket width — same ordinals, same decimal-exact value sums."""
    from liq_stream_spark.operators.sessionize import (
        sessionize,
        sessionize_bucketed,
    )
    from liq_stream_spark.plans.tables import load

    ev = load(spark, "/root/testdata/sf0.01", "events")
    base = {
        tuple(r)
        for r in sessionize(
            ev, "user_id", "ts", 1800, value_col="value",
            tiebreak_col="event_id",
        ).collect()
    }
    got = {
        tuple(r)
        for r in sessionize_bucketed(
            ev, "user_id", "ts", 1800, value_col="value",
            tiebreak_col="event_id", bucket_seconds=bucket_s,
        ).collect()
    }
    assert got == base and len(base) > 0


def test_bucketed_sessionize_hot_key_chain_merge(spark):
    """A hot key emitting one event per minute for 10 hours is ONE session
    that crosses every 1h bucket edge — the chain merge must reassemble it
    exactly; a cold key with in-bucket gaps must not over-merge."""
    from liq_stream_spark.operators.sessionize import (
        sessionize,
        sessionize_bucketed,
    )

    rows = [("hot", 1_700_000_000_000 + i * 60_000, 1.5, i) for i in range(600)]
    rows += [("cold", 1_700_000_000_000 + i * 7_200_000, 2.0, 1000 + i)
             for i in range(5)]  # 2h apart -> 5 separate sessions
    df = (
        spark.createDataFrame(rows, "k string, t long, value double, eid long")
        .select("k", F.timestamp_millis("t").alias("ts"), "value", "eid")
    )
    base = {
        tuple(r)
        for r in sessionize(
            df, "k", "ts", 1800, value_col="value", tiebreak_col="eid"
        ).collect()
    }
    got = {
        tuple(r)
        for r in sessionize_bucketed(
            df, "k", "ts", 1800, value_col="value", tiebreak_col="eid",
            bucket_seconds=3_600,
        ).collect()
    }
    assert got == base
    hot = [r for r in base if r[0] == "hot"]
    cold = [r for r in base if r[0] == "cold"]
    assert len(hot) == 1 and hot[0][1] == 1 and hot[0][2] == 600
    assert len(cold) == 5


def test_sessionization_partition_profile_sf01(spark):
    """Per-user row counts at sf0.1 — the window partition sizes the
    sessionization plan produces. Asserts the fixture keyspace is flat
    (max/avg < 10), i.e. no salting needed at test scale; the bucketed
    recipe above is the documented path when a production keyspace is
    skewed."""
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    per_key = ev.groupBy("user_id").count()
    stats = per_key.agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg"),
        F.count(F.lit(1)).alias("n_keys"),
    ).collect()[0]
    assert stats["n_keys"] > 100
    assert stats["mx"] / stats["avg"] < 10, (
        f"events keyspace skewed (max {stats['mx']}, avg {stats['avg']:.1f})"
        " — switch sessionization to the time-bucketed two-phase variant"
    )
