"""Range/interval join (operators/interval.py): the bucketized equi-join
must EQUAL the naive BETWEEN theta-join on every bucket width, plan as an
equi-join (never BroadcastNestedLoopJoin/CartesianProduct), and support
left semantics + equi-keys."""

import pytest
from pyspark.sql import functions as F

from liq_stream_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def data(spark):
    rows = spark.createDataFrame(
        [(i, 1_700_000_000_000 + i * 60_000, i % 3) for i in range(200)],
        "row_id long, t long, grp long",
    ).select("row_id", F.timestamp_millis("t").alias("t"), "grp")
    # overlapping intervals of mixed widths incl. one spanning many buckets
    ivals = spark.createDataFrame(
        [
            (0, 1_700_000_000_000, 1_700_000_600_000, 0),   # 10 min
            (1, 1_700_000_300_000, 1_700_003_300_000, 1),   # 50 min
            (2, 1_700_000_000_000, 1_700_011_900_000, 2),   # ~3.3 h
            (3, 1_700_020_000_000, 1_700_020_060_000, 0),   # matches nothing
        ],
        "ival_id long, s long, e long, grp long",
    ).select(
        "ival_id",
        F.timestamp_millis("s").alias("s"),
        F.timestamp_millis("e").alias("e"),
        "grp",
    )
    return rows, ivals


def naive(rows, ivals, with_grp):
    cond = (rows["t"] >= ivals["s"]) & (rows["t"] <= ivals["e"])
    if with_grp:
        cond = cond & (rows["grp"] == ivals["grp"])
    j = rows.join(ivals, cond, "inner")
    return {
        (r["row_id"], r["ival_id"])
        for r in j.select(rows["row_id"], ivals["ival_id"]).collect()
    }


@pytest.mark.parametrize("bucket_ms", [60_000, 600_000, 3_600_000])
@pytest.mark.parametrize("with_grp", [False, True])
def test_equals_naive_between_join(spark, data, bucket_ms, with_grp):
    rows, ivals = data
    expected = naive(rows, ivals, with_grp)
    got_df = interval_join(
        rows, ivals, "t", "s", "e",
        on="grp" if with_grp else None, bucket_ms=bucket_ms,
    )
    got = {(r["row_id"], r["ival_id"]) for r in got_df.collect()}
    assert got == expected and len(expected) > 0


def test_plan_is_equi_join_not_nested_loop(spark, data):
    rows, ivals = data
    bucketized = interval_join(rows, ivals, "t", "s", "e", bucket_ms=600_000)
    plan = bucketized._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the naive formulation really does degenerate — document the contrast
    cond = (rows["t"] >= ivals["s"]) & (rows["t"] <= ivals["e"])
    naive_plan = (
        rows.join(ivals, cond, "inner")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_left_join_keeps_unmatched_rows(spark, data):
    rows, ivals = data
    # restrict to rows outside every interval: t > all ends
    left = interval_join(rows, ivals, "t", "s", "e", bucket_ms=600_000, how="left")
    inner = interval_join(rows, ivals, "t", "s", "e", bucket_ms=600_000)
    n_rows = rows.count()
    matched_rows = {r["row_id"] for r in inner.select("row_id").distinct().collect()}
    got = left.collect()
    # every row appears; unmatched ones exactly once with NULL interval cols
    by_row = {}
    for r in got:
        by_row.setdefault(r["row_id"], []).append(r)
    assert set(by_row) == {r["row_id"] for r in rows.collect()}
    for rid, rs in by_row.items():
        if rid not in matched_rows:
            assert len(rs) == 1 and rs[0]["ival_id"] is None
    assert len(got) == inner.count() + (n_rows - len(matched_rows))


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    hd=st.data(),
    bucket_ms=st.sampled_from([1, 7_000, 60_000, 10**7]),
)
def test_property_equals_naive(spark, hd, bucket_ms):
    """Random point sets x random (possibly zero-width, possibly inverted)
    intervals: the bucketized join equals the naive BETWEEN semantics for
    any bucket width. Inverted intervals (end < start) match nothing —
    Spark's sequence() runs descending rather than throwing, and the exact
    range refine discards every such candidate."""
    ts = st.integers(min_value=0, max_value=10**6)
    n_rows = hd.draw(st.integers(1, 30))
    n_ivals = hd.draw(st.integers(1, 10))
    row_ts = [hd.draw(ts) for _ in range(n_rows)]
    spans = [
        sorted((hd.draw(ts), hd.draw(ts)))
        if hd.draw(st.booleans())
        else (hd.draw(ts), hd.draw(ts))  # sometimes inverted
        for _ in range(n_ivals)
    ]
    rows = spark.createDataFrame(
        [(i, t) for i, t in enumerate(row_ts)], "row_id long, tt long"
    ).select("row_id", F.timestamp_millis("tt").alias("tt"))
    ivals = spark.createDataFrame(
        [(j, s, e) for j, (s, e) in enumerate(spans)],
        "ival_id long, ss long, ee long",
    ).select(
        "ival_id",
        F.timestamp_millis("ss").alias("ss"),
        F.timestamp_millis("ee").alias("ee"),
    )
    expected = {
        (i, j)
        for i, t in enumerate(row_ts)
        for j, (s, e) in enumerate(spans)
        if s <= t <= e
    }
    got = {
        (r["row_id"], r["ival_id"])
        for r in interval_join(
            rows, ivals, "tt", "ss", "ee", bucket_ms=bucket_ms
        ).collect()
    }
    assert got == expected


def test_validation(spark, data):
    rows, ivals = data
    with pytest.raises(ValueError):
        interval_join(rows, ivals, "t", "s", "e", how="full")
    with pytest.raises(ValueError):
        interval_join(rows, ivals, "t", "s", "e", bucket_ms=0)
    with pytest.raises(ValueError):
        interval_join(rows, ivals, "t", "s", "e", on="missing")
