"""Fourth tranche: lead/lag sequence analytics, combined semi+anti
correlated-subquery shapes, and NTILE/PERCENT_RANK distribution windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import dsum, load


@register(
    "q34_customer_order_gaps",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
                 AS prev_dt
      FROM orders
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(prev_dt) AS BIGINT) AS n_gaps,
           CAST(SUM(date_diff('day', prev_dt::DATE, o_orderdate::DATE))
                AS BIGINT) AS total_gap_days,
           CAST(MAX(date_diff('day', prev_dt::DATE, o_orderdate::DATE))
                AS BIGINT) AS max_gap_days,
           CASE WHEN COUNT(prev_dt) > 0
                THEN SUM(date_diff('day', prev_dt::DATE,
                                   o_orderdate::DATE))::DOUBLE
                     / COUNT(prev_dt)
           END AS avg_gap_days
    FROM seq GROUP BY o_custkey
    """,
    doc="per-customer inter-order gap analysis via lag(): one shuffle on "
    "custkey serves both the sequence window and the aggregation (Spark "
    "reuses the hash partitioning). Gap sums/counts are exact integers; "
    "the average is a single IEEE division, hence oracle-exact.",
)
def q34_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"), F.col("prev_dt").cast("date")
    )
    seq = orders.withColumn("prev_dt", F.lag("o_orderdate").over(w))
    return seq.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count("prev_dt").cast("long").alias("n_gaps"),
        F.sum(gap).cast("long").alias("total_gap_days"),
        F.max(gap).cast("long").alias("max_gap_days"),
        F.when(
            F.count("prev_dt") > 0,
            F.sum(gap).cast("double") / F.count("prev_dt"),
        ).alias("avg_gap_days"),
    )


@register(
    "q35_customers_no_finished_orders",
    """
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           c.c_nationkey AS nationkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    ORDER BY custkey
    """,
    doc="combined correlated EXISTS + NOT EXISTS: customers who have "
    "orders but none in status 'F'. Planned as a semi join plus an anti "
    "join on the same key — both shuffle once on custkey and neither "
    "materializes the subquery, the shape that survives a fact-table "
    "blowup (no DISTINCT on orders, no IN-list).",
)
def q35_customers_no_finished_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    has_any = orders.select(F.col("o_custkey").alias("c_custkey"))
    has_f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        cust.join(has_any, "c_custkey", "left_semi")
        .join(has_f, "c_custkey", "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )


@register(
    "q36_spend_deciles",
    """
    WITH spend AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS total_spend,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, total_spend,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(ntile(10) OVER (ORDER BY total_spend DESC, custkey)
                AS BIGINT) AS decile,
           percent_rank() OVER (ORDER BY total_spend DESC, custkey)
               AS pct_rank
    FROM spend
    """,
    doc="customer-spend distribution: NTILE(10) deciles and PERCENT_RANK "
    "over decimal-exact per-customer totals. The global ORDER BY window is "
    "the one shape that genuinely serializes — fine here because it runs "
    "over the pre-aggregated customer table (|customers| rows, not "
    "|orders|); at 100 TB the aggregation shrinks the window input by "
    "orders of magnitude first. Ties broken by custkey so ranks are "
    "deterministic.",
)
def q36_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum("o_totalprice").alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy(F.desc("total_spend"), F.asc("custkey"))
    return spend.select(
        "custkey",
        "total_spend",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )
