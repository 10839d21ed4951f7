"""Sixth tranche: LATERAL correlated subqueries and IGNORE NULLS
gap-filling — two modern-SQL surfaces (Spark 4 features) the reference
engine's consumers would otherwise emulate with application loops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from liq_stream_spark.operators.bounded_window import (
    derive_bucket_seconds,
    lead_ts_bucketed,
    trailing_decimal_moments_bucketed,
    trailing_values_bucketed,
)
from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import load

# Bucket width for the event_type-keyed bounded windows (q45/q47/q50):
# DERIVED from the frame's measured density (span, rows, key count) so
# rows per (key, bucket) stay ~64x the frame depth at ANY volume — a
# hardcoded day bucket put 100 TB/day back into one (key, day) task
# (VERDICT r6 item 1). One narrow min/max/count scan per build, cached
# per (sf_dir, preceding) so rebuilding a query (bench warm runs, plan
# audits) never re-scans. The cache is process-lifetime with NO
# invalidation — correct for the immutable fixture dirs it keys on; if a
# directory were rewritten in-process the width would be stale but the
# ANSWER would not (the bucketed operators are equivalence-proven for
# ANY width — tests/test_bounded_window.py — so a stale width costs
# parallelism tuning only, never correctness). Deployments indexing
# mutable paths should key on a corpus version instead (the
# index_cache._fingerprint pattern).
_BUCKET_CACHE: dict[tuple[str, int], int] = {}


def _evt_bucket_seconds(ev, sf_dir: str, preceding: int) -> int:
    key = (sf_dir, preceding)
    if key not in _BUCKET_CACHE:
        _BUCKET_CACHE[key] = derive_bucket_seconds(
            ev, "event_type", "ts", preceding
        )
    return _BUCKET_CACHE[key]


@register(
    "q43_lateral_topn",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 3) t
    """,
    doc="LATERAL correlated subquery: top-3 orders per customer written "
    "as a per-row subquery with ORDER BY + LIMIT — the forEach-shaped "
    "SQL users actually write. Catalyst DECORRELATES it: the executed "
    "plan (pinned in tests/test_plans.py) is WindowGroupLimit + one "
    "join, i.e. the optimizer rewrites the per-customer loop into "
    "exactly q07's rank-filter shape — no per-row re-execution, no "
    "nested loop, so the lateral surface scales like any windowed "
    "top-k. Deterministic tie-break on (price DESC, orderkey).",
)
def q43_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("q43_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("q43_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM q43_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM q43_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 3) t
        """
    )


@register(
    "q44_gap_fill",
    """
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
    doc="event-time gap fill / forward fill: carry each user's most "
    "recent purchase value onto every subsequent event via "
    "last_value(...) IGNORE NULLS over a running row frame — the "
    "standard telemetry imputation (fill sensor readings, last-known "
    "price, session attributes) that row-at-a-time engines do with "
    "per-key cursors. One window = one shuffle on user_id + an "
    "in-partition sort on (ts, event_id); the running frame is "
    "incremental (no per-row rescan). The filled value is copied, "
    "never recomputed — float-exact against the oracle. Total "
    "tie-break (ts, event_id) makes the fill deterministic.",
)
def q44_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(sparse, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "q45_twap",
    """
    WITH d AS (
      SELECT event_type, value,
             epoch_us(lead(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(dt_us) AS BIGINT) AS n_intervals,
           CAST(SUM(CAST(value AS DECIMAL(25,6)) * dt_us) AS DOUBLE)
             / SUM(dt_us) AS twap
    FROM d
    GROUP BY event_type
    """,
    doc="time-weighted average (TWAP) per event_type: each value is "
    "weighted by the microseconds until the NEXT event of the same "
    "type (the standard market-data aggregate the reference's "
    "liquidation consumers compute downstream; last event per type "
    "carries no interval). The lead runs BUCKETED "
    "(operators/bounded_window.lead_ts_bucketed, r4/r5 hot-key ask): "
    "the event-level window partitions on (event_type, time bucket) — "
    "width DERIVED from the frame's measured density, so rows per "
    "bucket stay bounded at any volume — and a 5-value key never "
    "serializes into one task; each bucket's last row takes the next "
    "bucket's head from a bucket-level lead over span/bucket rows per "
    "key. The agg then shuffles on event_type. value x dt "
    "products accumulate as exact DECIMAL x BIGINT (task-order-free); "
    "one IEEE division per group. Plan pinned: no event-level window "
    "partitioned on event_type alone (tests/test_plans.py).",
)
def q45_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", "ts", "event_id"
    )
    led = lead_ts_bucketed(
        ev,
        "event_type",
        "ts",
        "event_id",
        _evt_bucket_seconds(ev, sf_dir, preceding=1),
        out_col="__lead",
    )
    d = led.select(
        "event_type",
        "value",
        (F.unix_micros("__lead") - F.unix_micros("ts")).alias("dt_us"),
    )
    return d.groupBy("event_type").agg(
        F.count("dt_us").alias("n_intervals"),
        (
            F.sum(F.col("value").cast("decimal(25,6)") * F.col("dt_us"))
            .cast("double")
            / F.sum("dt_us")
        ).alias("twap"),
    )


@register(
    "q46_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.act_week) // 7 AS BIGINT)
             AS weeks_since,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    doc="retention cohort matrix — the product-analytics staple: users "
    "cohorted by first-event week, counted in every later week they "
    "were active (weekly because the fixture's event log spans one "
    "month). Two aggs + one user-key equi-join, all riding "
    "hash(user_id); the offset is an exact integer day-difference/7 "
    "(both engines truncate weeks to Monday, and week starts are "
    "always 7k days apart — never float month arithmetic), with weeks "
    "surfaced as DATE in BOTH engines (the q42 date-canonicalization "
    "lesson). The (cohort, weeks_since) matrix is dashboard-sized "
    "however large the event log.",
)
def q46_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("act_week")
    ).distinct()
    weeks_since = (
        F.datediff("act_week", "cohort") / F.lit(7)
    ).cast("long")
    return (
        firsts.join(activity, "user_id")
        .groupBy("cohort", weeks_since.alias("weeks_since"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q47_anomaly_zscore",
    """
    WITH w AS (
      SELECT event_id, event_type, value,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER tw AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) OVER tw AS DOUBLE)
               AS ssq,
             COUNT(value) OVER tw AS n
      FROM events
      WINDOW tw AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, value,
           CAST(n AS BIGINT) AS n_window,
           CASE WHEN n >= 5 AND (ssq - s * s / n) / (n - 1) > 0
                THEN (value - s / n)
                     / sqrt((ssq - s * s / n) / (n - 1))
           END AS zscore
    FROM w
    """,
    doc="rolling z-score anomaly detection: each event's value scored "
    "against the trailing 20 same-type events' mean/stddev (frame "
    "excludes the current row — no self-contamination; NULL until 5 "
    "non-NULL priors exist or when variance is 0; NULL readings count "
    "toward neither sums nor denominators but DO occupy frame slots). "
    "The 20-PRECEDING moments run BUCKETED (operators/bounded_window."
    "trailing_decimal_moments_bucketed, r4/r5 hot-key ask): the "
    "event-level window partitions on (event_type, density-derived "
    "time bucket) — never event_type alone — with INCREMENTAL decimal "
    "window sums; only the "
    "<= 20 first rows of each bucket fold the broadcast carry of the "
    "previous buckets' 20-row tails. DECIMAL(18,6) values; squares "
    "computed at (18,6)x(18,6) -> (37,12) (exact in BOTH engines; a "
    "(25,6) square would overflow and re-round divergently); the "
    "windowed sums accumulate at their NATURAL precisions "
    "((28,6)/(38,12) — the single-window form's own range) and only "
    "carry-folding rows narrow through (37,12), NULL (try_cast) past "
    "1e25 — see bounded_window's range-bound contract. At this "
    "fixture's magnitudes every accumulation and re-cast is exact, so "
    "mean and variance are IEEE functions of exact inputs and sqrt is "
    "IEEE-correctly-rounded — the whole score is oracle-exact with no "
    "quantization, identical to the single-window form. The batch form "
    "of the monitoring rule a streaming deploy runs with "
    "applyInPandasWithState. Plan pinned: no event-level window "
    "partitioned on event_type alone (tests/test_plans.py).",
)
def q47_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts"
    )
    fr = trailing_decimal_moments_bucketed(
        ev, "event_type", "ts", "event_id", "value",
        preceding=20,
        bucket_seconds=_evt_bucket_seconds(ev, sf_dir, preceding=20),
    )
    n = F.col("__n")
    s = F.col("__s")
    ssq = F.col("__ssq")
    var = (ssq - s * s / n) / (n - F.lit(1))
    z = F.when(
        (n >= 5) & (var > 0),
        (F.col("value") - s / n) / F.sqrt(var),
    )
    return fr.select(
        "event_id",
        "event_type",
        "value",
        n.cast("long").alias("n_window"),
        z.alias("zscore"),
    )


@register(
    "q48_above_nation_average",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(*)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
    doc="correlated SCALAR subquery: customers with an account balance "
    "above their own nation's average — the per-row subquery users "
    "write, which Catalyst DECORRELATES into one per-nation aggregate "
    "joined back (pinned: no per-row re-execution, no nested loop; the "
    "q43 lesson for scalar subqueries). The average is an exact "
    "decimal sum over one IEEE division, so the > comparison is "
    "engine-stable with no quantization.",
)
def q48_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("q48_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("q48_nation")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal
        FROM q48_customer c JOIN q48_nation n
          ON n.n_nationkey = c.c_nationkey
        WHERE c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*)
          FROM q48_customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@register(
    "q49_scd2_history",
    """
    SELECT o_custkey,
           o_orderkey,
           o_orderstatus,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey)
             AS valid_to,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) IS NULL
             AS is_current
    FROM orders
    """,
    doc="SCD type-2 history build: each customer's order stream becomes "
    "validity intervals — valid_from = this record's date, valid_to = "
    "the next record's date (NULL + is_current for the open interval) "
    "— the slowly-changing-dimension pattern every warehouse layers "
    "on an append log, and the batch shape of a temporal MERGE. One "
    "window shuffle on the natural key with a deterministic "
    "(date, orderkey) tie-break; values are copied dates, so the "
    "frame is oracle-exact with no arithmetic at all. Point-in-time "
    "lookups against the result are q17's as-of join.",
)
def q49_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return od.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# EWMA weights precomputed in PYTHON and embedded as literals in both
# engines: (1-a)^j products are bit-identical by construction, so the
# runtime does no pow() (not correctly-rounded!) and no transcendental
# at all — the d17 multiplication-chain technique, hoisted to literals.
_Q50_ALPHA = 0.25
_Q50_K = 20
_Q50_PW = []
_acc = 1.0
for _ in range(_Q50_K):
    _Q50_PW.append(_acc)
    _acc *= 1.0 - _Q50_ALPHA
_Q50_CUMW = []
_c = 0.0
for _w in _Q50_PW:
    _c += _w
    _Q50_CUMW.append(_c)
_PW_SQL = ", ".join(repr(w) for w in _Q50_PW)
_CUMW_SQL = ", ".join(repr(w) for w in _Q50_CUMW)


@register(
    "q50_ewma",
    f"""
    WITH base AS (
      SELECT event_id, event_type, value,
             list(value) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id
                               ROWS BETWEEN {_Q50_K - 1} PRECEDING
                               AND CURRENT ROW) AS xs
      FROM events WHERE value IS NOT NULL
    ),
    rev AS (
      SELECT event_id, event_type, value, list_reverse(xs) AS rxs
      FROM base
    )
    SELECT event_id, event_type, value,
           CAST(len(rxs) AS BIGINT) AS n_window,
           list_reduce(
             list_transform(range(1, len(rxs) + 1),
                            i -> rxs[i] * ([{_PW_SQL}])[i]),
             (a, b) -> a + b
           ) / ([{_CUMW_SQL}])[len(rxs)] AS ewma
    FROM rev
    """,
    doc="exponentially-weighted moving average (alpha=0.25, 20-sample "
    "truncated window, normalized) of each event's value over the "
    "trailing same-type stream — the standard smoothing every "
    "monitoring/market pipeline runs next to q47's z-score. The "
    "(1-a)^j weights and their cumulative sums are PYTHON-precomputed "
    "literals shipped to both engines, and the weighted sum is a "
    "sequential in-row left fold — identical IEEE operation order on "
    "identical bits, so the result is oracle-exact with zero runtime "
    "transcendentals and no quantization. The 20-row frame is "
    "materialized BUCKETED (operators/bounded_window."
    "trailing_values_bucketed, r4/r5 hot-key ask): the event-level "
    "window partitions on (event_type, density-derived time bucket), "
    "never event_type alone, and the frame array is identical to the single-window "
    "collect_list (values pre-filtered non-NULL). In-row work is O(K) "
    "per row. Plan pinned: no event-level window partitioned on "
    "event_type alone (tests/test_plans.py).",
)
def q50_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value", "ts")
    )
    pw = ", ".join(repr(x) + "D" for x in _Q50_PW)
    cumw = ", ".join(repr(x) + "D" for x in _Q50_CUMW)
    base = trailing_values_bucketed(
        ev, "event_type", "ts", "event_id", "value",
        preceding=_Q50_K - 1,
        bucket_seconds=_evt_bucket_seconds(ev, sf_dir, preceding=_Q50_K - 1),
        include_current=True, out_col="xs",
    )
    ewma = F.expr(
        f"aggregate(zip_with(reverse(xs), slice(array({pw}), 1, size(xs)), "
        f"(x, wt) -> x * wt), 0.0D, (a, t) -> a + t) "
        f"/ element_at(array({cumw}), size(xs))"
    )
    return base.select(
        "event_id",
        "event_type",
        "value",
        F.size("xs").cast("long").alias("n_window"),
        ewma.alias("ewma"),
    )
