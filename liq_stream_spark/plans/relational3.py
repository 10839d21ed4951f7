"""Third tranche: CUBE grouping sets, full outer join, and approximate
sketch aggregates (HLL / quantile sketches are engine-specific, so the
sketch query is rows-only with exact companions for sanity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import dsum, load


@register(
    "q28_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="full CUBE grouping sets (all 2^2 grouping combinations).",
)
def q28_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("total")
    )


@register(
    "q29_nation_activity_full_outer",
    """
    WITH cust AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           CAST(coalesce(c.n_customers, 0) AS BIGINT) AS n_customers,
           CAST(coalesce(s.n_suppliers, 0) AS BIGINT) AS n_suppliers
    FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
    """,
    doc="full outer join with coalesced keys (nations having only "
    "customers or only suppliers survive).",
)
def q29_nation_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = cust.alias("c").join(
        supp.alias("s"),
        F.col("c.nationkey") == F.col("s.nationkey"),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.coalesce(F.col("c.n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("s.n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@register(
    "q30_sketch_aggregates",
    None,  # HLL/KLL sketch internals differ per engine — rows-only; the
    # exact companions (q09 distinct counts, q25 percentiles) are oracled
    doc="approximate aggregates for interactive scale: approx_count_distinct "
    "(HyperLogLog++) and percentile_approx sketches — the 100 TB answer "
    "when exact distinct/percentile shuffles are too expensive.",
)
def q30_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n"),
    )
