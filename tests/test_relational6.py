"""Semantic unit tests for the sixth relational tranche — the cases the
sf fixtures cannot exercise (NULL readings, open SCD intervals)."""

import math

from pyspark.sql import functions as F


def test_q47_null_values_do_not_deflate_moments(spark):
    # 6 priors for the scored event, 3 of them NULL: mean/std must use
    # the 3 observed values only (COUNT(value), not COUNT(*))
    rows = [
        (i, "2024-01-01 10:%02d:00" % i, "t", v)
        for i, v in enumerate([10.0, None, 20.0, None, 30.0, None])
    ] + [(9, "2024-01-01 10:09:00", "t", 100.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.createOrReplaceTempView("_q47_unit")  # not used; direct build below

    from pyspark.sql import Window

    tw = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    dec = F.col("value").cast("decimal(18,6)")
    s = F.sum(dec).over(tw).cast("double")
    ssq = F.sum(dec * dec).over(tw).cast("double")
    n = F.count("value").over(tw)
    var = (ssq - s * s / n) / (n - F.lit(1))
    z = F.when((n >= 3) & (var > 0), (F.col("value") - s / n) / F.sqrt(var))
    out = {
        r["event_id"]: (r["n"], r["z"])
        for r in df.select("event_id", n.alias("n"), z.alias("z")).collect()
    }
    n_obs, zval = out[9]
    assert n_obs == 3  # NULLs excluded from the denominator
    mean, sd = 20.0, 10.0  # exact moments of {10, 20, 30}
    assert zval is not None and math.isclose(zval, (100.0 - mean) / sd)


def test_q49_scd2_intervals_chain(spark):
    import __spark_entry__ as em

    df = em.queries()["q49_scd2_history"](spark, "/root/testdata/sf0.001")
    # exactly one open (current) interval per customer
    open_counts = (
        df.groupBy("o_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .select(F.min("n_open").alias("lo"), F.max("n_open").alias("hi"))
        .collect()[0]
    )
    assert open_counts["lo"] == 1 and open_counts["hi"] == 1
    # intervals never overlap: valid_to of a closed row >= its valid_from
    bad = df.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") < F.col("valid_from"))
    ).count()
    assert bad == 0
