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
    "over decimal-exact per-customer totals — computed WITHOUT the "
    "global ORDER BY window (r4/r5 ask: a no-partition WindowExec "
    "single-tasks the whole customer dimension). Distributed global "
    "ranking instead: 32 RANGE buckets from one approx-percentile "
    "aggregate (edge placement only balances load — ANY edges give the "
    "same answer), row_number within each bucket, bucket row-counts "
    "prefix-summed IN-ROW on one collected 32-element array and "
    "broadcast back, so global_rank = bucket_offset + local_rank with "
    "no single-partition sort anywhere. decile then applies NTILE's "
    "exact fill rule (first n%10 tiles take one extra row) and "
    "pct_rank = (rank-1)/(n-1) — rank == row_number because "
    "(spend DESC, custkey) is a total order; both are integer "
    "arithmetic on exact ranks, oracle-identical. Skew note: ties "
    "share a value-range bucket, so a tie-heavy domain would extend "
    "the bucketing key, but spend totals are effectively tie-free. "
    "Plan pinned: no unpartitioned windowspecdefinition "
    "(tests/test_plans.py).",
)
def q36_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum("o_totalprice").alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    n_buckets = 32
    edges = spend.agg(
        F.percentile_approx(
            "total_spend",
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
            10_000,
        ).alias("__E")
    )
    # DESC-monotone range bucket: the number of edges above my spend
    # grows as spend falls; equal spends share a bucket (custkey only
    # breaks ties WITHIN a bucket, which is all rank needs)
    b = spend.crossJoin(F.broadcast(edges)).withColumn(
        "__rb",
        F.size(F.filter("__E", lambda e: e > F.col("total_spend"))),
    ).drop("__E")
    wrb = Window.partitionBy("__rb").orderBy(
        F.desc("total_spend"), F.asc("custkey")
    )
    b = b.withColumn("__rn", F.row_number().over(wrb))

    # bucket offsets: prefix sums over the <= 32 (bucket, count) pairs,
    # folded in-row on ONE collected array — no unpartitioned window
    cts = b.groupBy("__rb").agg(F.count(F.lit(1)).alias("__c"))
    offs = (
        cts.agg(F.collect_list(F.struct("__rb", "__c")).alias("xs"))
        .select(
            F.explode(
                F.expr(
                    "transform(array_sort(xs), (x, i) -> struct("
                    "x.__rb AS __rb, "
                    "aggregate(slice(array_sort(xs), 1, i), 0L, "
                    "(a, y) -> a + y.__c) AS __off))"
                )
            ).alias("o"),
            F.expr("aggregate(xs, 0L, (a, y) -> a + y.__c)").alias("__n"),
        )
        .select("o.__rb", "o.__off", "__n")
    )
    g = b.join(F.broadcast(offs), "__rb").withColumn(
        "__g", F.col("__off") + F.col("__rn")
    )

    # NTILE(10) from the exact global rank: base rows per tile plus one
    # extra in the first n%10 tiles (the SQL-standard fill both engines
    # implement); guard covers n < 10 (base 0: tile = rank)
    tiles = 10
    base = F.floor(F.col("__n") / tiles)
    rem = F.col("__n") % tiles
    big = rem * (base + 1)  # rows living in the (base+1)-sized tiles
    decile = F.when(
        F.col("__g") <= big,
        F.floor((F.col("__g") - 1) / (base + 1)) + 1,
    ).otherwise(rem + F.floor((F.col("__g") - big - 1) / base) + 1)
    pct_rank = F.when(F.col("__n") > 1,
        (F.col("__g") - 1).cast("double") / (F.col("__n") - 1)
    ).otherwise(F.lit(0.0))
    return g.select(
        "custkey",
        "total_spend",
        F.col("n_orders").cast("long").alias("n_orders"),
        decile.cast("long").alias("decile"),
        pct_rank.alias("pct_rank"),
    )
