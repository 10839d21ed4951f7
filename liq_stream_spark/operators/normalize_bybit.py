"""Bybit liquidation normalizer — handles both wire schemas.

Reference semantics (bybit_adapter.py:145-227):
- topic dispatch (F6): ``allLiquidation.<SYM>`` → data is a list of compact
  rows {T,s,S,v,p}; legacy ``liquidation.<SYM>`` → data is a dict OR a list
  of {updatedTimeE6,symbol,side,size,price}; topicless frames dropped
- symbol: ``s`` else ``symbol`` else "" (truthy, N4)
- side: lowercase buy→short / sell→long, else "" — empty string, not NULL
  (N13, bybit_adapter.py:191-192)
- qty/price: ``_to_float(... or 0)`` — parse failure yields 0.0, row is KEPT
  (bybit_adapter.py:17-21), unlike binance's skip
- notional: price*qty if both truthy else 0.0 — never NULL
  (bybit_adapter.py:197)
- ts: ``T`` (new, ms) else ``updatedTimeE6/1000`` (legacy, µs→ms, N10) else
  frame ``ts``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from liq_stream_spark.functions import (
    now_ms,
    side_from_bybit,
    truthy_coalesce,
    truthy_double,
)
from liq_stream_spark.session import case_sensitive_analysis
from liq_stream_spark.schema import (
    BYBIT_FRAME_LEGACY_DICT_SCHEMA,
    BYBIT_FRAME_LEGACY_LIST_SCHEMA,
    BYBIT_FRAME_NEW_SCHEMA,
)


def normalize_bybit(frames: DataFrame, market: str = "usdt") -> DataFrame:
    # reference lowercases the market label ((market or "").lower(),
    # bybit_adapter.py:50) — accept any case like normalize_binance does
    market = (market or "").lower()
    if market == "usdt":
        mk = "usdt"
    elif market in ("coin", "coinm", "inverse"):
        mk = market  # reference stores self.market verbatim (lowercased)
    else:
        raise ValueError(f"Unknown Bybit market: {market}")

    # "s"/"S" and "T" wire keys need case-sensitive resolution; restore the
    # caller's setting after the plan is analyzed (session.py helper).
    with case_sensitive_analysis(frames.sparkSession):
        return _build(frames, mk)


def _build(frames: DataFrame, mk: str) -> DataFrame:
    if "ts_ingest_ms" not in frames.columns:
        frames = frames.withColumn("ts_ingest_ms", now_ms())

    topic = F.get_json_object("value", "$.topic")
    frames = frames.withColumn("topic", topic).filter(
        F.col("topic").isNotNull() & (F.col("topic") != "")
    )

    # --- new channel: allLiquidation.<SYMBOL>, data = list of compact rows
    new_rows = (
        frames.filter(F.col("topic").startswith("allLiquidation."))
        .select(
            F.from_json("value", BYBIT_FRAME_NEW_SCHEMA).alias("f"), "ts_ingest_ms"
        )
        .filter(F.col("f").isNotNull())
        .select(
            F.col("f.ts").alias("msg_ts"),
            F.explode(F.col("f.data")).alias("liq"),
            "ts_ingest_ms",
        )
        .select(
            "msg_ts",
            "ts_ingest_ms",
            F.col("liq.s").alias("s"),
            F.lit(None).cast("string").alias("symbol_legacy"),
            F.col("liq.S").alias("S"),
            F.lit(None).cast("string").alias("side_legacy"),
            F.col("liq.v").alias("v"),
            F.lit(None).cast("string").alias("size"),
            F.col("liq.p").alias("p"),
            F.lit(None).cast("string").alias("price_legacy"),
            F.col("liq.T").alias("T"),
            F.lit(None).cast("string").alias("updatedTimeE6"),
            F.to_json(F.col("liq")).alias("raw"),
        )
    )

    # --- legacy channel: liquidation.<SYMBOL>, data = dict OR list
    legacy = frames.filter(F.col("topic").startswith("liquidation."))
    legacy_parsed = legacy.select(
        F.from_json("value", BYBIT_FRAME_LEGACY_LIST_SCHEMA).alias("fl"),
        F.from_json("value", BYBIT_FRAME_LEGACY_DICT_SCHEMA).alias("fd"),
        "ts_ingest_ms",
    )
    # dict-shaped data parses to NULL under the list schema and vice versa;
    # wrap the dict form into a 1-element array and take whichever resolved
    # (bybit_adapter.py:165-169).
    legacy_rows = (
        legacy_parsed.select(
            F.coalesce(F.col("fl.ts"), F.col("fd.ts")).alias("msg_ts"),
            F.coalesce(F.col("fl.data"), F.array(F.col("fd.data"))).alias("rows"),
            "ts_ingest_ms",
        )
        .filter(F.col("rows").isNotNull())
        .select("msg_ts", F.explode("rows").alias("liq"), "ts_ingest_ms")
        .filter(F.col("liq").isNotNull())
        .select(
            "msg_ts",
            "ts_ingest_ms",
            F.lit(None).cast("string").alias("s"),
            F.col("liq.symbol").alias("symbol_legacy"),
            F.lit(None).cast("string").alias("S"),
            F.col("liq.side").alias("side_legacy"),
            F.lit(None).cast("string").alias("v"),
            F.col("liq.size").alias("size"),
            F.lit(None).cast("string").alias("p"),
            F.col("liq.price").alias("price_legacy"),
            F.lit(None).cast("long").alias("T"),
            F.col("liq.updatedTimeE6").alias("updatedTimeE6"),
            F.to_json(F.col("liq")).alias("raw"),
        )
    )

    rows = new_rows.unionByName(legacy_rows)

    # Reference parity: when updatedTimeE6 is *present* but unparsable,
    # ``int(liq["updatedTimeE6"])`` raises and the whole row is dropped
    # (bybit_adapter.py:203-204, caught at :226) — it does NOT fall through
    # to the frame ts. Only the T-is-null (legacy) arm can reach it.
    rows = rows.filter(
        ~(
            F.col("T").isNull()
            & F.col("updatedTimeE6").isNotNull()
            & F.col("updatedTimeE6").try_cast("long").isNull()
        )
    )

    # _to_float(x or 0): truthy-coalesce then cast; failure → 0.0, row kept
    qty = F.coalesce(truthy_double(F.col("v"), F.col("size"), F.lit("0")), F.lit(0.0))
    price = F.coalesce(
        truthy_double(F.col("p"), F.col("price_legacy"), F.lit("0")), F.lit(0.0)
    )
    # µs→ms: int(int(u)/1000) truncates toward zero; timestamps are positive
    # so integer division matches (N10).
    ts_exch = F.coalesce(
        F.col("T"),
        (F.col("updatedTimeE6").try_cast("long") / 1000).cast("long"),
        F.col("msg_ts"),
    )

    return rows.select(
        F.lit("bybit").alias("exchange"),
        F.lit(mk).alias("market"),
        F.coalesce(
            truthy_coalesce(F.col("s"), F.col("symbol_legacy")), F.lit("")
        ).alias("symbol"),
        side_from_bybit(truthy_coalesce(F.col("S"), F.col("side_legacy"))).alias(
            "side"
        ),
        qty.alias("qty"),
        price.alias("price"),
        F.when((price != 0.0) & (qty != 0.0), price * qty)
        .otherwise(F.lit(0.0))
        .alias("notional"),
        ts_exch.alias("ts_exch_ms"),
        F.col("ts_ingest_ms"),
        F.col("raw"),
    )
