"""Second tranche of relational surface: correlated subqueries, HAVING,
ordered string aggregation, date part extraction, exact percentiles,
conditional aggregation, and heterogeneous UNION ALL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import dsum, load


@register(
    "q21_cheapest_part_supplier",
    """
    SELECT l.l_partkey, CAST(MIN(l.l_suppkey) AS BIGINT) AS best_suppkey,
           MIN(l.l_extendedprice / l.l_quantity) AS best_unit_price
    FROM lineitem l
    WHERE (l.l_extendedprice / l.l_quantity) = (
      SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    """,
    doc="correlated scalar subquery (TPC-H Q2 shape) — decorrelated to a "
    "per-key window min in the Spark plan, one shuffle instead of a "
    "rescan per row.",
)
def q21_cheapest_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "unit_price", F.col("l_extendedprice") / F.col("l_quantity")
    )
    w = W.partitionBy("l_partkey")
    return (
        li.withColumn("min_up", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_up"))
        .groupBy("l_partkey")
        .agg(
            F.min("l_suppkey").alias("best_suppkey"),
            F.min("unit_price").alias("best_unit_price"),
        )
    )


@register(
    "q22_frequent_customers",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    doc="aggregate + HAVING post-filter.",
)
def q22_frequent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "q23_nation_customer_roster",
    """
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS roster,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
    doc="ordered string aggregation (sorted collect_list + array_join).",
)
def q23_nation_customer_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias(
                "roster"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q24_orders_by_year_quarter",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
    doc="datetime part extraction + multi-level time rollup.",
)
def q24_orders_by_year_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mth"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "q25_quantity_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact interpolated percentiles (Spark percentile ≡ DuckDB "
    "quantile_cont on this integral domain).",
)
def q25_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "q26_conditional_aggregates",
    """
    SELECT l_linestatus,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_taxfree,
           CAST(SUM(CAST(CASE WHEN l_quantity > 40 THEN l_extendedprice ELSE 0 END
                    AS DECIMAL(25,6))) AS DOUBLE) AS bulk_revenue
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="conditional aggregation (FILTER clauses / CASE-sum).",
)
def q26_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
        dsum(
            F.when(F.col("l_quantity") > 40, F.col("l_extendedprice")).otherwise(
                F.lit(0.0)
            )
        ).alias("bulk_revenue"),
    )


@register(
    "q27_activity_union",
    """
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT actor) AS BIGINT) AS n_actors
    FROM (
      SELECT 'order' AS kind, o_custkey AS actor FROM orders
      UNION ALL
      SELECT 'event' AS kind, user_id AS actor FROM events
    )
    GROUP BY kind
    """,
    doc="heterogeneous UNION ALL normalized to a common activity schema "
    "(the engine's multi-venue fan-in pattern over testdata tables).",
)
def q27_activity_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"), F.col("o_custkey").alias("actor")
    )
    events = load(spark, sf_dir, "events").select(
        F.lit("event").alias("kind"), F.col("user_id").alias("actor")
    )
    return (
        orders.unionAll(events)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("actor").alias("n_actors"),
        )
    )


@register(
    "q33_rolling_range_window",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_90d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS spend_90d
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
      RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
    )
    """,
    doc="RANGE-frame window: per customer, each order's trailing-90-day "
    "order count and decimal-exact spend. The frame is a VALUE range over "
    "the day number (same-day peers all included), not a row count — the "
    "surface ROWS frames (q08) and bucketed windows (q14/q31) don't "
    "cover.",
)
def q33_rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-90, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_90d"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("spend_90d"),
    )
