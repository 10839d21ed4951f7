"""Relational operator surface over the TPC-H-ish tables.

The reference implements none of these (SURVEY.md §2.8) — they come free via
Spark SQL over the canonical table. Each query exercises a distinct operator
family and is oracle-checked against DuckDB: filters/projection, hash + sort
aggregation, inner/semi/anti joins, broadcast dims, window functions,
set operations, scalar functions, top-k.

Scale notes (100 TB): fact-fact joins shuffle on the join key; dimension
joins are broadcast (nation/region/supplier stay tiny at any SF; customer/
part/orders grow with SF but joins to them are keyed and AQE picks the
strategy). Aggregations are partial (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import dsum, load

# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan + filter + hash agg (map-side partial).",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.skew import spread_for_compute

    # the four exact-decimal sums are this plan's per-row hot spot and
    # they run in the SCAN stage (map-side partial agg) — a lineitem
    # arriving in fewer splits than the session has cores (single-row-
    # group fixture files) would accumulate 100% of the decimals on one
    # task. Hash-spread on columns ALREADY in the read set (shipdate +
    # price — a PK key would widen the pruned 7-column scan by one) so
    # column pruning is untouched; the shipdate filter still pushes to
    # the scan below the exchange. No-op at 100 TB where splits >=
    # cores. r13: 1.17 -> 0.78 s warm at sf0.1.
    li = spread_for_compute(
        load(spark, sf_dir, "lineitem"),
        key_cols=["l_shipdate", "l_extendedprice"],
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_top_revenue_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="fact-fact equi-join on orderkey + agg + deterministic top-k. "
    "The revenue aggregation is PUSHED BELOW the join (r6): lineitem "
    "pre-aggregates per l_orderkey with a map-side partial combine, so "
    "the join ships one decimal per order instead of ~4 full-width "
    "lineitem rows — at 100 TB that shrinks the fact shuffle by the "
    "lines-per-order factor before a byte moves. Lossless rewrite: "
    "o_orderkey is orders' primary key, so (orderkey, date, priority) "
    "groups == orderkey groups, and the exact-decimal sum is "
    "associative across the split. Catalyst does not push aggregates "
    "through joins itself, so the plan declares it.",
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.skew import spread_for_compute

    # spread ON THE PRE-AGG KEY: the per-orderkey decimal pre-aggregate
    # below is the map-side hot spot, and hash partitioning on
    # l_orderkey both parallelizes it on single-row-group fixtures and
    # is REUSED by the groupBy (no second exchange — guide §2.4's
    # "share one exchange"). No-op at 100 TB (r13).
    li = spread_for_compute(
        load(spark, sf_dir, "lineitem"), key_cols=["l_orderkey"]
    )
    orders = load(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pre = li.groupBy("l_orderkey").agg(dsum(rev).alias("revenue"))
    return (
        pre.join(orders, pre.l_orderkey == orders.o_orderkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q03_region_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="snowflake join chain; nation/region broadcast at any scale.",
)
def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.skew import spread_for_compute

    # all four dimension joins build against broadcasts, so the probe
    # side (lineitem) does joins + partial agg inside its SCAN stage —
    # single-tasked when the file layout cannot feed the cores.
    # Hash-spread on the PK (no-op at 100 TB; r13).
    li = spread_for_compute(
        load(spark, sf_dir, "lineitem"), key_cols=["l_orderkey"]
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="left-semi join (EXISTS) + agg.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q05_customers_without_urgent_orders",
    """
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(c.c_custkey) AS BIGINT) AS min_custkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
    doc="left-anti join (NOT EXISTS) + agg.",
)
def q05_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
    )


@register(
    "q06_revenue_change",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure predicate pushdown + scalar agg.",
)
def q06_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q07_top_orders_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    doc="top-k per group via ranking window.",
)
def q07_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q08_running_customer_spend",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS BIGINT)
             AS prev_orderkey
    FROM orders
    """,
    doc="running aggregate + lag over an ordered per-key window.",
)
def q08_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).cast("long").alias("prev_orderkey"),
    )


@register(
    "q09_distinct_stats",
    """
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT l_partkey)  AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey)  AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
    doc="exact distinct aggregation (expand+two-phase in Spark).",
)
def q09_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # THREE independent single-distinct aggregates crossJoined instead
    # of one multi-distinct agg (r13): Spark plans multiple DISTINCT
    # column sets via Expand — every input row is materialized 4x
    # (one copy per distinct group + one for the plain count) before
    # the partial hash agg, so the scan stage pays 4N row copies and a
    # 4N-row hash probe. A single-distinct agg needs no Expand (plain
    # two-phase partial-distinct), each scan prunes to ONE column
    # (same total I/O — the old shape read all three columns in its one
    # scan), shuffle bytes are identical (the partial-distinct sets),
    # and the three subtrees are independent stages the scheduler runs
    # concurrently. The crossJoins are 1-row x 1-row broadcasts (global
    # aggs always yield exactly one row, even on empty input, so the
    # join is exactly 1x1x1 — the PLANS.md single-row-totals BNLJ
    # convention). Warm min-of-5 at sf0.1: 0.76 -> 0.39 s, and the
    # min-of-3 spread tightens (1.44 s worst -> 0.45 s worst).
    li = load(spark, sf_dir, "lineitem")
    a = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    b = li.agg(F.countDistinct("l_partkey").alias("n_parts"))
    c = li.agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    return a.crossJoin(b).crossJoin(c).select(
        "n_orders", "n_parts", "n_suppliers", "n_rows"
    )


@register(
    "q10_set_ops",
    """
    WITH big_spenders AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    ), building AS (
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM building)
    UNION ALL
    SELECT 'except' AS op, custkey FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM building)
    """,
    doc="INTERSECT / EXCEPT set operators.",
)
def q10_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        orders.filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return big.intersect(building).select(
        F.lit("intersect").alias("op"), "custkey"
    ).unionAll(
        big.subtract(building).select(F.lit("except").alias("op"), "custkey")
    )


@register(
    "q11_scalar_functions",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTR(p_name, 1, 12) AS name_prefix,
           p_name || '#' || CAST(p_size AS VARCHAR) AS name_sized,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           ABS(p_size - 25) AS size_dist,
           CASE WHEN p_retailprice >= 1500 THEN 'premium'
                WHEN p_retailprice >= 900  THEN 'mid' ELSE 'budget' END AS tier,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass
    FROM part
    """,
    doc="scalar function surface (SURVEY.md §2.6) exercised per-row.",
)
def q11_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.concat(
            F.col("p_name"), F.lit("#"), F.col("p_size").cast("string")
        ).alias("name_sized"),
        F.length("p_name").cast("long").alias("name_len"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.when(F.col("p_retailprice") >= 1500, "premium")
        .when(F.col("p_retailprice") >= 900, "mid")
        .otherwise("budget")
        .alias("tier"),
        F.floor("p_retailprice").alias("price_floor"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
    )


@register(
    "q12_market_share",
    """
    SELECT n.n_name AS nation,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spend,
           CAST(MAX(o.o_totalprice) AS DOUBLE) AS max_order,
           CAST(MIN(o.o_totalprice) AS DOUBLE) AS min_order
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="join + mixed distinct/minmax/sum aggregate.",
)
def q12_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total_spend"),
            F.max("o_totalprice").alias("max_order"),
            F.min("o_totalprice").alias("min_order"),
        )
    )


@register(
    "q13_supplier_part_stats",
    """
    SELECT s.s_name, p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY s.s_name, p.p_brand
    """,
    doc="two broadcast dim joins with a pushed-down dim filter.",
)
def q13_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("s_name", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            dsum("l_quantity").alias("total_qty"),
        )
    )
