"""operators/bounded_window: the bucketed two-phase rewrite must be
output-IDENTICAL to the plain one-window-per-key form for any bucket
width — including widths that force deep carry chains (bucket << frame,
so a frame spans many buckets) and the degenerate one-bucket width (pure
phase-1). NULL values must keep their frame slots, and NULL keys must
group together like Window.partitionBy does."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from liq_stream_spark.operators.bounded_window import (
    derive_bucket_seconds,
    lead_ts_bucketed,
    trailing_decimal_moments_bucketed,
    trailing_values_bucketed,
)


def _events(spark, with_null_key=False):
    # 2 hot keys x 60 rows, irregular second-spaced ts, some NULL values,
    # duplicate timestamps within a key (tiebreak exercises total order)
    rows = []
    eid = 0
    for k in ("a", "b") + ((None,) if with_null_key else ()):
        t = 0
        for i in range(60):
            t += (i * 7) % 13  # includes 0 steps -> duplicate ts
            v = None if i % 11 == 5 else float((i * 31) % 97)
            rows.append((eid, k, t, v))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, k string, s long, v double")
    return df.withColumn("ts", F.timestamp_seconds("s")).drop("s")


def _ref_frame(df, preceding, include_current):
    w = (
        W.partitionBy("k")
        .orderBy("ts", "event_id")
        .rowsBetween(-preceding, 0 if include_current else -1)
    )
    return df.withColumn(
        "want",
        F.transform(
            F.collect_list(F.struct(F.col("v").alias("v"))).over(w),
            lambda s: s["v"],
        ),
    )


@pytest.mark.parametrize("bucket", [1, 5, 40, 10_000])
@pytest.mark.parametrize(
    "preceding,include_current", [(1, False), (3, True), (20, False), (19, True)]
)
def test_trailing_frame_equivalent_for_any_bucket(
    spark, bucket, preceding, include_current
):
    df = _events(spark)
    got = trailing_values_bucketed(
        df, "k", "ts", "event_id", "v", preceding, bucket,
        include_current=include_current, out_col="got",
    )
    ref = _ref_frame(df, preceding, include_current)
    merged = got.join(ref.select("event_id", "want"), "event_id")
    bad = merged.filter(
        ~F.coalesce(
            F.col("got").eqNullSafe(F.col("want")), F.lit(False)
        )
    )
    assert bad.count() == 0, bad.select("event_id", "got", "want").take(5)
    assert got.count() == df.count()


def test_null_keys_group_like_partition_by(spark):
    df = _events(spark, with_null_key=True)
    got = trailing_values_bucketed(
        df, "k", "ts", "event_id", "v", 5, 7, out_col="got"
    )
    ref = _ref_frame(df, 5, False)
    merged = got.join(ref.select("event_id", "want"), "event_id")
    assert merged.count() == df.count()
    assert (
        merged.filter(~F.col("got").eqNullSafe(F.col("want"))).count() == 0
    )


@pytest.mark.parametrize("bucket", [1, 5, 10_000])
def test_lead_equivalent_for_any_bucket(spark, bucket):
    df = _events(spark, with_null_key=True)
    got = lead_ts_bucketed(df, "k", "ts", "event_id", bucket, out_col="got")
    w = W.partitionBy("k").orderBy("ts", "event_id")
    ref = df.withColumn("want", F.lead("ts").over(w))
    merged = got.join(ref.select("event_id", "want"), "event_id")
    assert merged.count() == df.count()
    assert (
        merged.filter(~F.col("got").eqNullSafe(F.col("want"))).count() == 0
    )


@pytest.mark.parametrize("bucket", [1, 5, 40, 10_000])
@pytest.mark.parametrize("preceding", [1, 3, 20])
def test_moments_equivalent_to_window_sums(spark, bucket, preceding):
    """The incremental-sums specialization must reproduce the plain
    decimal window sums BIT-exactly (the doubles, not approximately) —
    including NULL results on frames with no non-NULL value, and the
    NULL-slot semantics (NULL rows occupy frame positions but join no
    sum). Bucket widths down to 1 s force carry-dominated frames."""
    df = _events(spark, with_null_key=True)
    got = trailing_decimal_moments_bucketed(
        df, "k", "ts", "event_id", "v", preceding, bucket
    )
    w = (
        W.partitionBy("k")
        .orderBy("ts", "event_id")
        .rowsBetween(-preceding, -1)
    )
    dec = F.col("v").cast("decimal(18,6)")
    ref = df.select(
        "event_id",
        F.sum(dec).over(w).cast("double").alias("ws"),
        F.sum(dec * dec).over(w).cast("double").alias("wq"),
        F.count("v").over(w).alias("wn"),
    )
    merged = got.join(ref, "event_id")
    assert merged.count() == df.count()
    bad = merged.filter(
        ~F.col("__s").eqNullSafe(F.col("ws"))
        | ~F.col("__ssq").eqNullSafe(F.col("wq"))
        | (F.col("__n") != F.col("wn"))
    )
    assert bad.count() == 0, bad.select(
        "event_id", "__s", "ws", "__ssq", "wq", "__n", "wn"
    ).take(5)


def test_moments_all_null_frame_is_null(spark):
    """A frame whose every slot is NULL must yield NULL sums and n=0 —
    exactly like a plain window sum over the same frame."""
    rows = [(i, "k", i, None if i < 25 else float(i)) for i in range(40)]
    df = spark.createDataFrame(
        rows, "event_id long, k string, s long, v double"
    ).withColumn("ts", F.timestamp_seconds("s")).drop("s")
    got = trailing_decimal_moments_bucketed(
        df, "k", "ts", "event_id", "v", 5, 7
    )
    r10 = got.filter(F.col("event_id") == 10).collect()[0]
    assert r10["__s"] is None and r10["__ssq"] is None and r10["__n"] == 0


def test_multi_key_windows_equivalent(spark):
    """Composite partition keys (the (symbol, venue)-shaped case) must
    behave exactly like Window.partitionBy(k1, k2) across all three
    operators."""
    df = _events(spark).withColumn(
        "k2", (F.col("event_id") % 2).cast("string")
    )
    keys = ["k", "k2"]
    w = W.partitionBy(*keys).orderBy("ts", "event_id")

    got_lead = lead_ts_bucketed(df, keys, "ts", "event_id", 7, out_col="g")
    ref_lead = df.withColumn("w", F.lead("ts").over(w))
    m = got_lead.join(ref_lead.select("event_id", "w"), "event_id")
    assert m.filter(~F.col("g").eqNullSafe(F.col("w"))).count() == 0

    got_fr = trailing_values_bucketed(
        df, keys, "ts", "event_id", "v", 5, 7, out_col="g"
    )
    ref_fr = df.withColumn(
        "w",
        F.transform(
            F.collect_list(F.struct(F.col("v").alias("v"))).over(
                w.rowsBetween(-5, -1)
            ),
            lambda s: s["v"],
        ),
    )
    m = got_fr.join(ref_fr.select("event_id", "w"), "event_id")
    assert m.filter(~F.col("g").eqNullSafe(F.col("w"))).count() == 0

    got_mo = trailing_decimal_moments_bucketed(
        df, keys, "ts", "event_id", "v", 5, 7
    )
    dec = F.col("v").cast("decimal(18,6)")
    ref_mo = df.select(
        "event_id",
        F.sum(dec).over(w.rowsBetween(-5, -1)).cast("double").alias("ws"),
        F.count("v").over(w.rowsBetween(-5, -1)).alias("wn"),
    )
    m = got_mo.join(ref_mo, "event_id")
    assert (
        m.filter(
            ~F.col("__s").eqNullSafe(F.col("ws"))
            | (F.col("__n") != F.col("wn"))
        ).count()
        == 0
    )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=12, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=0, max_value=5_000),  # seconds
                st.one_of(
                    st.none(),
                    st.floats(
                        min_value=-1e3,
                        max_value=1e3,
                        allow_nan=False,
                        allow_infinity=False,
                    ),
                ),
            ),
            min_size=1,
            max_size=60,
        ),
        bucket=st.sampled_from([1, 17, 300, 100_000]),
        preceding=st.integers(min_value=1, max_value=8),
    )
    def test_random_gaps_equivalent(spark, rows, bucket, preceding):
        """Hypothesis sweep: irregular timestamps create EMPTY buckets
        between events (runs of buckets with no rows), duplicate
        timestamps across keys, and frames spanning many sparse buckets
        — the gap patterns the fixed generator can't reach. All three
        operators must match the plain one-window-per-key form
        exactly."""
        df = spark.createDataFrame(
            [(i, k, s, v) for i, (k, s, v) in enumerate(rows)],
            "event_id long, k string, s long, v double",
        ).withColumn("ts", F.timestamp_seconds("s")).drop("s")
        w = W.partitionBy("k").orderBy("ts", "event_id")

        got = trailing_values_bucketed(
            df, "k", "ts", "event_id", "v", preceding, bucket, out_col="g"
        )
        ref = df.withColumn(
            "w",
            F.transform(
                F.collect_list(F.struct(F.col("v").alias("v"))).over(
                    w.rowsBetween(-preceding, -1)
                ),
                lambda s: s["v"],
            ),
        )
        m = got.join(ref.select("event_id", "w"), "event_id")
        assert m.count() == len(rows)
        assert m.filter(~F.col("g").eqNullSafe(F.col("w"))).count() == 0

        got_l = lead_ts_bucketed(
            df, "k", "ts", "event_id", bucket, out_col="g"
        )
        ref_l = df.withColumn("w", F.lead("ts").over(w))
        m = got_l.join(ref_l.select("event_id", "w"), "event_id")
        assert m.filter(~F.col("g").eqNullSafe(F.col("w"))).count() == 0


def test_rejects_bad_args(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="positive"):
        trailing_values_bucketed(df, "k", "ts", "event_id", "v", 5, 0)
    with pytest.raises(ValueError, match=">= 1"):
        trailing_values_bucketed(df, "k", "ts", "event_id", "v", 0, 10)
    with pytest.raises(ValueError, match=">= 1"):
        derive_bucket_seconds(df, "k", "ts", 0)
    with pytest.raises(ValueError, match=">= 2"):
        derive_bucket_seconds(df, "k", "ts", 5, target_multiple=1)


def _dense_frame(spark, n_per_key, span_s, keys=("a", "b")):
    """n_per_key rows per key spread uniformly over [0, span_s)."""
    rows = []
    eid = 0
    for k in keys:
        for i in range(n_per_key):
            rows.append((eid, k, i * span_s // n_per_key, float(i % 50)))
            eid += 1
    return (
        spark.createDataFrame(
            rows, "event_id long, k string, s long, v double"
        )
        .withColumn("ts", F.timestamp_seconds("s"))
        .drop("s")
    )


def test_derived_width_shrinks_as_density_grows(spark):
    """VERDICT r6 item 1's done-criterion: same span, 10x the rows ->
    ~10x narrower buckets, so rows per (key, bucket) stay ~constant at
    target_multiple * preceding instead of one (key, span-chunk) window
    task growing without bound."""
    span = 30 * 24 * 3600  # a month, like the events fixture
    sparse = _dense_frame(spark, 2_000, span)
    dense = _dense_frame(spark, 20_000, span)
    P = 20
    w_sparse = derive_bucket_seconds(sparse, "k", "ts", P)
    w_dense = derive_bucket_seconds(dense, "k", "ts", P)
    assert w_dense < w_sparse
    # ratio tracks the density ratio (approx_count_distinct slack aside)
    assert 5 <= w_sparse / w_dense <= 20
    # rows per (key, bucket) land at ~ target_multiple * P in both
    for df_, width in ((sparse, w_sparse), (dense, w_dense)):
        per_bucket = df_.count() / 2 / (span / width)
        assert 0.5 * 64 * P <= per_bucket <= 2 * 64 * P


def test_derived_width_caps_bucket_count_for_sparse_spans(spark):
    """A long sparse span must not explode into millions of near-empty
    buckets (the carry pass is per-key serialized over bucket rows):
    the bucket count per key is capped at max_buckets_per_key."""
    span = 10 * 365 * 24 * 3600  # ten sparse years
    df = _dense_frame(spark, 3_000, span)
    w = derive_bucket_seconds(
        df, "k", "ts", 1, target_multiple=2, max_buckets_per_key=100
    )
    assert span / w <= 101  # bucket count per key capped (+rounding)


def test_derived_width_degenerate_frames(spark):
    """Empty frames and single-instant frames have nothing to
    parallelize — any width is correct; the fallback must simply not
    divide by zero."""
    empty = _dense_frame(spark, 1, 1).filter(F.lit(False))
    assert derive_bucket_seconds(empty, "k", "ts", 5) >= 1
    one_ts = _dense_frame(spark, 1, 1)
    assert derive_bucket_seconds(one_ts, "k", "ts", 5) >= 1


def test_hot_key_spreads_across_tasks_at_runtime(spark):
    """VERDICT r6 item 5: the plan pins prove SHAPE (window partitioned
    on (key, bucket)); this proves SPREAD — with one event_type holding
    95% of rows, the operator's window stage must not concentrate the
    hot key into one task. Measured from inside the job: rows per
    physical partition via spark_partition_id() on the operator output
    (no exchange sits between the phase-1 window and the output — the
    carry comes back by broadcast — so the ids ARE the window stage's
    tasks). The single-window form measured the same way concentrates
    ~95% in one task; the bucketed form's max-task share stays < 30%.
    AQE partition coalescing is disabled for the measurement (it merges
    small test-sized shuffles back to one partition — the r6 lesson)."""
    rows = []
    eid = 0
    for k, n in (("hot", 19_000), ("a", 250), ("b", 250), ("c", 250),
                 ("d", 250)):
        for i in range(n):
            rows.append((eid, k, i * 20_000 // n, float(i % 100)))
            eid += 1
    df = (
        spark.createDataFrame(
            rows, "event_id long, k string, s long, v double"
        )
        .withColumn("ts", F.timestamp_seconds("s"))
        .drop("s")
    )
    total = len(rows)

    conf = spark.conf
    saved = {
        "spark.sql.adaptive.coalescePartitions.enabled": conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        ),
        "spark.sql.shuffle.partitions": conf.get(
            "spark.sql.shuffle.partitions"
        ),
    }
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "16")
    try:
        width = derive_bucket_seconds(
            df, "k", "ts", 20, target_multiple=8
        )
        got = trailing_decimal_moments_bucketed(
            df, "k", "ts", "event_id", "v", 20, width
        )
        # aggregate the MOMENT columns, not a bare count — an unused
        # window gets pruned by Catalyst and the measurement would then
        # read the scan stage's uniform input partitions, not the
        # window stage
        spread = (
            got.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("count"), F.sum("__n").alias("f"))
            .collect()
        )
        max_share = max(r["count"] for r in spread) / total
        assert len(spread) > 1
        assert max_share < 0.30, (
            f"hot key concentrated: max task holds {max_share:.0%} "
            f"of rows across {len(spread)} tasks"
        )

        # contrast: the single-window form serializes the hot key
        w = W.partitionBy("k").orderBy("ts", "event_id")
        single = (
            df.withColumn("__x", F.row_number().over(w))
            .withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("count"), F.max("__x").alias("f"))
            .collect()
        )
        single_max = max(r["count"] for r in single) / total
        assert single_max > 0.9  # the failure mode being engineered out
    finally:
        for key_, val in saved.items():
            conf.set(key_, val)


def test_moments_carry_overflow_is_null_not_zero(spark):
    """r7 review: a carry row whose LOCAL square-sum overflows the
    (37,12) re-cast (>= 1e25) must surface NULL — the old coalesce
    conflated that overflow-NULL with the empty-frame NULL and
    substituted 0, yielding a plausible-looking wrong __ssq. Rows under
    the cliff (either side of the carry band) must stay exact."""
    # one bucket, 26 rows of 9e11 (square 8.1e23): at P=20, carry rows
    # (r <= 20) overflow once >= 13 values precede (1.053e25 > 1e25);
    # non-carry rows (r > 20) stay on the natural (38,12) path (< 1e26)
    rows = [(i, "k", i, 9e11) for i in range(1, 27)]
    df = (
        spark.createDataFrame(rows, "event_id long, k string, s long, v double")
        .withColumn("ts", F.timestamp_seconds("s"))
        .drop("s")
    )
    P = 20
    got = trailing_decimal_moments_bucketed(
        df, "k", "ts", "event_id", "v", P, 10_000
    ).select("event_id", "__ssq", "__n").collect()
    by_id = {r["event_id"]: r for r in got}
    sq = 8.1e23
    for i in range(2, 27):
        n_prec = min(i - 1, P)
        r = by_id[i]
        assert r["__n"] == n_prec
        if i <= P and n_prec >= 13:  # carry row past the (37,12) cliff
            assert r["__ssq"] is None, f"row {i}: expected NULL, got {r['__ssq']}"
        else:
            assert r["__ssq"] is not None and abs(
                r["__ssq"] - n_prec * sq
            ) <= 1e12, f"row {i}: {r['__ssq']} != {n_prec * sq}"


def test_moments_exact_at_large_magnitudes(spark):
    """ADVICE r6: the old (36,12) re-cast silently NULLed the square-sum
    once P * v^2 >= 1e24 (|v| >= ~2.2e11 at P=20) — a range the plain
    single-window form handled. The natural-precision accumulators must
    stay bit-exact there, INCLUDING carry-folding rows (bucket << span
    forces them), up to square-sums ~1e25 near the documented carry-row
    ceiling."""
    # |v| ~ 4.9e11 -> v^2 ~ 2.4e23; 20-row frames sum to ~4.8e24 — past
    # the old 1e24 NULL cliff, inside the new (37,12) carry ceiling
    rows = [
        (i, "k", i * 3, 4.9e11 + (i % 7) * 1e5 + 0.25) for i in range(80)
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id long, k string, s long, v double"
        )
        .withColumn("ts", F.timestamp_seconds("s"))
        .drop("s")
    )
    P = 20
    got = trailing_decimal_moments_bucketed(
        df, "k", "ts", "event_id", "v", P, 7  # 7 s buckets: carry rows
    )
    w = W.partitionBy("k").orderBy("ts", "event_id").rowsBetween(-P, -1)
    dec = F.col("v").cast("decimal(18,6)")
    ref = df.select(
        "event_id",
        F.sum(dec).over(w).cast("double").alias("ws"),
        F.sum(dec * dec).over(w).cast("double").alias("wq"),
        F.count("v").over(w).alias("wn"),
    )
    m = got.join(ref, "event_id")
    # every full frame is PAST the old overflow cliff — assert we are
    # actually exercising that band, then exact equality incl. no NULLs
    full = m.filter(F.col("__n") == P)
    assert full.count() > 0
    assert full.filter(F.col("__ssq") < 1e24).count() == 0
    bad = m.filter(
        ~F.col("__s").eqNullSafe(F.col("ws"))
        | ~F.col("__ssq").eqNullSafe(F.col("wq"))
        | (F.col("__n") != F.col("wn"))
    )
    assert bad.count() == 0, bad.select(
        "event_id", "__s", "ws", "__ssq", "wq"
    ).take(5)
