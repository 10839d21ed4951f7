"""Parquet table loaders for the driver's synthetic star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics must match the UTC-naive DuckDB oracle even on a
    # caller session pinned to another zone (runtime-settable conf)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet — unreadable without this
        # (runtime-settable); get_spark sets it too, but the driver may hand
        # us a vanilla session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives either as TIMESTAMP(NANOS) (read as long nanos under
        # spark.sql.legacy.parquet.nanosAsLong — truncate ns -> µs like
        # DuckDB) or as µs TIMESTAMP_NTZ (newer fixture vintage). Normalize
        # both to a session-UTC TIMESTAMP so unix_micros()/INTERVAL math
        # downstream sees one type regardless of fixture vintage.
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def dsum(col, scale: int = 6):
    """Deterministic double sum: exact decimal accumulation, double result.

    Double summation order differs between engines (and between Spark task
    schedules), so raw SUM(double) is not hash-stable. Decimal arithmetic is
    exact and associative — identical in Spark and DuckDB — and one final
    cast back to double keeps the output schema simple.
    SQL mirror: CAST(SUM(CAST(x AS DECIMAL(25,scale))) AS DOUBLE).
    """
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")
