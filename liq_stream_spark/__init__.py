"""liq_stream_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of liquidation-labs/liq-stream.

The reference (surveyed in SURVEY.md) is a single-process asyncio ETL that
streams crypto liquidation events from five venues, normalizes them into one
unified 10-column row schema, and fans out to CSV / Postgres / console sinks.

This package re-expresses every operator Spark-first:

- ``schema``       — the unified liquidation schema + per-venue wire schemas
- ``functions``    — scalar expression helpers (truthy coalesce, ts heuristics)
- ``operators``    — per-venue normalizers (pure DataFrame → DataFrame fns),
                     dedup family, similarity search, text analysis, as-of join
- ``sources``      — JSONL replay, Hyperliquid hour-file layout, websocket
                     Python Data Sources
- ``sinks``        — fan-out foreachBatch: partitioned parquet/csv, JDBC, console
- ``streaming``    — Structured Streaming wiring (watermark dedup, triggers)
- ``plans``        — the analytics query library used by bench/entry

Every transform is written batch-first: the identical DataFrame function runs
under batch replay (unit tests, DuckDB oracle checks) and under Structured
Streaming (micro-batch), exploiting Spark's batch/stream unification.
"""

__version__ = "0.1.0"
