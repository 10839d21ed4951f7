"""The liquidation-domain pipeline exposed through the driver contract.

These queries run the five venue normalizers over the replay fixtures
(tests/fixtures/*.jsonl, built from the reference's docstring samples).
The three aggregate queries carry a FULL DuckDB oracle: the oracle SQL
re-parses the SAME fixture JSONL with DuckDB's JSON functions, reproducing
every normalizer semantic the aggregates depend on (array-or-object
flatten, truthy coalescing, try-cast drop/keep rules, side maps, the HL
timestamp heuristic and tid|user|coin dedup) — see ``_duck_liq_union``.
``liq_unified_rows`` value-gates the fan-in row set itself (all columns
but ``raw``); only ``liq_normalize_unified`` — the full 10-column
surface — stays rows-only, because the ``raw`` re-serialization is
wire-format-specific (typed-struct key order, documented N21 deviation)
and is golden-tested in tests/test_normalizers.py instead.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.operators import (
    normalize_aster,
    normalize_binance,
    normalize_bybit,
    normalize_hyperliquid,
    normalize_okx,
)
from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import dsum
from liq_stream_spark.sources.replay import read_jsonl_frames

_FIXTURES = Path(__file__).resolve().parents[2] / "tests" / "fixtures"
_INGEST = 1_800_000_000_000  # pinned for determinism

# the typed BINANCE_ORDER_SCHEMA keys (schema.py) — the oracle's binance
# keep-filter requires at least one to be present, matching the engine's
# to_json(typed o) != '{}' rule
_BIN_ANY_SCHEMA_KEY = " OR ".join(
    f"json_extract(ev::JSON, '$.o.{k}') IS NOT NULL"
    for k in ("s", "S", "o", "f", "q", "p", "ap", "X", "l", "z", "T")
)


def _duck_liq_union() -> str:
    """DuckDB CTEs reproducing ``unified_liquidations`` (minus raw /
    ts_ingest, which no oracled aggregate touches) straight from the
    fixture JSONL. Cross-engine hazards handled: DuckDB CAST(DOUBLE AS
    BIGINT) rounds where Spark truncates — the HL heuristic only multiplies
    exact integers by 1000, so no fractional case exists; DuckDB ASC
    defaults to NULLS LAST where Spark is NULLS FIRST — orderings pin it
    explicitly."""
    fx = _FIXTURES.as_posix()

    def lines(fname: str) -> str:
        return (
            f"SELECT unnest(string_split(content, chr(10))) AS value "
            f"FROM read_text('{fx}/{fname}')"
        )

    # --- binance/aster: array-or-object flatten, truthy price/qty chains,
    # drop on unparsable cast (binance_adapter.py:41-94)
    bin_ev = """
      SELECT unnest(json_transform(
               CASE WHEN json_type(value::JSON) = 'ARRAY' THEN value::JSON
                    ELSE ('[' || value || ']')::JSON END, '["JSON"]')) AS ev
      FROM {src} WHERE json_valid(value)
    """
    bin_rows = """
      SELECT
        COALESCE(json_extract_string(ev::JSON, '$.o.s'), '') AS symbol,
        CASE UPPER(COALESCE(json_extract_string(ev::JSON, '$.o.S'), ''))
             WHEN 'BUY' THEN 'short' WHEN 'SELL' THEN 'long' END AS side,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(ev::JSON, '$.o.l'), ''),
                          NULLIF(json_extract_string(ev::JSON, '$.o.z'), ''),
                          NULLIF(json_extract_string(ev::JSON, '$.o.q'), ''),
                          '0.0') AS DOUBLE) AS qty,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(ev::JSON, '$.o.ap'), ''),
                          NULLIF(json_extract_string(ev::JSON, '$.o.p'), ''),
                          '0.0') AS DOUBLE) AS price,
        COALESCE(TRY_CAST(json_extract_string(ev::JSON, '$.E') AS BIGINT),
                 TRY_CAST(json_extract_string(ev::JSON, '$.o.T') AS BIGINT))
          AS ts_exch_ms
      FROM {src}
      WHERE json_extract(ev::JSON, '$.o') IS NOT NULL
        AND json_extract(ev::JSON, '$.o') != 'null'::JSON
        -- mirror the ENGINE's keep-rule exactly: the normalizer parses o
        -- with the typed BINANCE_ORDER_SCHEMA and keeps the event iff the
        -- parsed struct is non-empty, i.e. at least one SCHEMA key is
        -- present — an o carrying only unknown keys drops (documented
        -- deviation from the reference's `if not o`, which would emit a
        -- fieldless row; a bare != '{{}}' check here would keep it)
        AND (""" + _BIN_ANY_SCHEMA_KEY + """)
    """
    notional_null = (
        "CASE WHEN price IS NOT NULL AND price != 0 "
        "AND qty IS NOT NULL AND qty != 0 THEN price * qty END"
    )

    # --- bybit: topic dispatch, dual schema, µs→ms with present-but-bad
    # updatedTimeE6 dropping the row (bybit_adapter.py:145-227)
    bybit = f"""
    by_topic AS (
      SELECT j, json_extract_string(j, '$.topic') AS topic,
             TRY_CAST(json_extract_string(j, '$.ts') AS BIGINT) AS msg_ts
      FROM (SELECT value::JSON AS j FROM raw_bybit WHERE json_valid(value))
    ),
    by_new AS (
      SELECT msg_ts,
             json_extract_string(liq, '$.s') AS s,
             json_extract_string(liq, '$.S') AS sd,
             json_extract_string(liq, '$.v') AS v,
             json_extract_string(liq, '$.p') AS p,
             TRY_CAST(json_extract_string(liq, '$.T') AS BIGINT) AS t_ms,
             NULL::VARCHAR AS symbol_l, NULL::VARCHAR AS side_l,
             NULL::VARCHAR AS size_l, NULL::VARCHAR AS price_l,
             NULL::VARCHAR AS upd
      FROM (SELECT msg_ts,
                   unnest(json_transform(json_extract(j, '$.data'),
                                         '["JSON"]')) AS liq
            FROM by_topic WHERE starts_with(topic, 'allLiquidation.'))
    ),
    by_leg AS (
      SELECT msg_ts,
             NULL::VARCHAR AS s, NULL::VARCHAR AS sd,
             NULL::VARCHAR AS v, NULL::VARCHAR AS p, NULL::BIGINT AS t_ms,
             json_extract_string(liq, '$.symbol') AS symbol_l,
             json_extract_string(liq, '$.side') AS side_l,
             json_extract_string(liq, '$.size') AS size_l,
             json_extract_string(liq, '$.price') AS price_l,
             json_extract_string(liq, '$.updatedTimeE6') AS upd
      FROM (SELECT msg_ts,
                   unnest(json_transform(
                     CASE WHEN json_type(json_extract(j, '$.data')) = 'OBJECT'
                          THEN ('[' || json_extract(j, '$.data') || ']')::JSON
                          ELSE json_extract(j, '$.data') END,
                     '["JSON"]')) AS liq
            FROM by_topic
            WHERE starts_with(topic, 'liquidation.')
              AND json_extract(j, '$.data') IS NOT NULL)
    ),
    by_rows AS (
      SELECT
        COALESCE(NULLIF(s, ''), NULLIF(symbol_l, ''), '') AS symbol,
        CASE LOWER(COALESCE(NULLIF(sd, ''), NULLIF(side_l, ''), ''))
             WHEN 'buy' THEN 'short' WHEN 'sell' THEN 'long'
             ELSE '' END AS side,
        COALESCE(TRY_CAST(COALESCE(NULLIF(v, ''), NULLIF(size_l, ''), '0')
                          AS DOUBLE), 0.0) AS qty,
        COALESCE(TRY_CAST(COALESCE(NULLIF(p, ''), NULLIF(price_l, ''), '0')
                          AS DOUBLE), 0.0) AS price,
        COALESCE(t_ms, TRY_CAST(upd AS BIGINT) // 1000, msg_ts) AS ts_exch_ms
      FROM (SELECT * FROM by_new UNION ALL SELECT * FROM by_leg)
      WHERE NOT (t_ms IS NULL AND upd IS NOT NULL
                 AND TRY_CAST(upd AS BIGINT) IS NULL)
    )
    """

    # --- okx: channel filter, two-level flatten, -USDT/-USDC-SWAP market
    # filter, posSide whitelist (okx_adapter.py:43-107)
    okx = """
    okx_inst AS (
      SELECT unnest(json_transform(json_extract(j, '$.data'),
                                   '["JSON"]')) AS liq
      FROM (SELECT value::JSON AS j FROM raw_okx WHERE json_valid(value))
      WHERE json_extract_string(j, '$.arg.channel') = 'liquidation-orders'
        AND json_extract(j, '$.data') IS NOT NULL
    ),
    okx_det AS (
      SELECT COALESCE(json_extract_string(liq, '$.instId'), '') AS instId,
             unnest(json_transform(json_extract(liq, '$.details'),
                                   '["JSON"]')) AS d
      FROM okx_inst
      WHERE ends_with(COALESCE(json_extract_string(liq, '$.instId'), ''),
                      '-USDT-SWAP')
         OR ends_with(COALESCE(json_extract_string(liq, '$.instId'), ''),
                      '-USDC-SWAP')
    ),
    okx_rows AS (
      SELECT instId AS symbol,
        CASE WHEN LOWER(COALESCE(json_extract_string(d, '$.posSide'), ''))
                  IN ('long', 'short')
             THEN LOWER(json_extract_string(d, '$.posSide'))
             ELSE '' END AS side,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(d, '$.sz'), ''), '0.0')
                 AS DOUBLE) AS qty,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(d, '$.fillPx'), ''),
                          NULLIF(json_extract_string(d, '$.bkPx'), ''), '0.0')
                 AS DOUBLE) AS price,
        TRY_CAST(NULLIF(json_extract_string(d, '$.ts'), '') AS BIGINT)
          AS ts_exch_ms
      FROM okx_det
    )
    """

    # --- hyperliquid: substring prefilter, [taker, fill] pair shape,
    # liquidation-only + self-liquidation, tid|user|coin dedup, ts heuristic
    # (hyperliquid_adapter.py:14-60,166-257)
    hl_ts = (
        "CASE WHEN TRY_CAST({x} AS DOUBLE) IS NOT NULL THEN "
        "CASE WHEN TRY_CAST({x} AS DOUBLE) < 1e12 "
        "THEN CAST(TRY_CAST({x} AS DOUBLE) * 1000 AS BIGINT) "
        "ELSE CAST(TRY_CAST({x} AS DOUBLE) AS BIGINT) END "
        "ELSE epoch_ms(TRY_CAST(rtrim(regexp_replace({x}, 'Z$', '')) "
        "AS TIMESTAMP)) END"
    )
    hl = f"""
    hl_pairs AS (
      SELECT json_extract_string(j, '$.local_time') AS local_time,
             json_extract_string(j, '$.block_time') AS block_time,
             TRY_CAST(json_extract_string(j, '$.block_number') AS BIGINT)
               AS block_number,
             unnest(json_transform(json_extract(j, '$.events'),
                                   '["JSON"]')) AS ev,
             generate_subscripts(json_transform(json_extract(j, '$.events'),
                                                '["JSON"]'), 1) AS ev_idx
      FROM (SELECT value::JSON AS j FROM raw_hl
            WHERE value LIKE '%liquidation%' AND json_valid(value))
      WHERE json_extract(j, '$.events') IS NOT NULL
    ),
    hl_fills AS (
      SELECT *,
             json_extract_string(ev, '$[0]') AS taker,
             json_extract(ev, '$[1]') AS fill
      FROM hl_pairs
      WHERE json_extract(ev, '$[0]') IS NOT NULL
        AND json_extract(ev, '$[1]') IS NOT NULL
        AND json_extract(ev, '$[2]') IS NULL
        AND json_type(json_extract(ev, '$[1]')) = 'OBJECT'
    ),
    hl_kept AS (
      SELECT local_time, block_time, block_number, ev_idx,
             ABS(TRY_CAST(json_extract_string(fill, '$.sz') AS DOUBLE))
               AS sz_abs,
             json_extract_string(fill, '$.liquidation.liquidatedUser')
               AS liq_user,
             json_extract_string(fill, '$.coin') AS coin,
             json_extract_string(fill, '$.px') AS px,
             json_extract_string(fill, '$.dir') AS dir,
             json_extract_string(fill, '$.side') AS fside,
             json_extract_string(fill, '$.tid') AS tid
      FROM hl_fills
      WHERE json_extract(fill, '$.liquidation') IS NOT NULL
        AND taker = json_extract_string(fill, '$.liquidation.liquidatedUser')
    ),
    hl_dedup AS (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY concat_ws('|', COALESCE(tid, 'None'),
                       COALESCE(liq_user, 'None'), COALESCE(coin, 'None'))
          ORDER BY block_number ASC NULLS LAST, local_time ASC NULLS LAST,
                   ev_idx ASC) AS rn
      FROM hl_kept
      WHERE sz_abs IS NOT NULL AND sz_abs >= 0.0
    ),
    hl_rows AS (
      SELECT
        CASE WHEN UPPER(COALESCE(coin, '')) != ''
             THEN UPPER(coin) || 'USDC' ELSE '' END AS symbol,
        CASE WHEN contains(LOWER(COALESCE(dir, '')), 'close long')
               THEN 'long'
             WHEN contains(LOWER(COALESCE(dir, '')), 'close short')
               THEN 'short'
             WHEN UPPER(COALESCE(fside, '')) = 'A' THEN 'long'
             WHEN UPPER(COALESCE(fside, '')) = 'B' THEN 'short'
        END AS side,
        sz_abs AS qty,
        TRY_CAST(COALESCE(NULLIF(px, ''), '0.0') AS DOUBLE) AS price,
        CASE WHEN {hl_ts.format(x="block_time")} IS NOT NULL
                  AND {hl_ts.format(x="block_time")} != 0
             THEN {hl_ts.format(x="block_time")}
             ELSE {hl_ts.format(x="local_time")} END AS ts_exch_ms
      FROM hl_dedup WHERE rn = 1
    )
    """

    return f"""
    raw_binance AS ({lines("binance_force_order.jsonl")}),
    raw_bybit AS ({lines("bybit_liquidation.jsonl")}),
    raw_okx AS ({lines("okx_liquidation_orders.jsonl")}),
    raw_hl AS ({lines("hyperliquid_fills.jsonl")}),
    bin_ev AS ({bin_ev.format(src="raw_binance")}),
    bin_rows AS ({bin_rows.format(src="bin_ev")}),
    {bybit},
    {okx},
    {hl},
    liq AS (
      SELECT 'binance' AS exchange, 'usdt' AS market, symbol, side, qty,
             price, {notional_null} AS notional, ts_exch_ms
      FROM bin_rows WHERE price IS NOT NULL AND qty IS NOT NULL
      UNION ALL
      SELECT 'aster', 'usdt', symbol, side, qty, price,
             {notional_null}, ts_exch_ms
      FROM bin_rows WHERE price IS NOT NULL AND qty IS NOT NULL
      UNION ALL
      SELECT 'bybit', 'usdt', symbol, side, qty, price,
             CASE WHEN price != 0 AND qty != 0 THEN price * qty
                  ELSE 0.0 END, ts_exch_ms
      FROM by_rows
      UNION ALL
      SELECT 'okx', 'usdt', symbol, side, qty, price,
             {notional_null}, ts_exch_ms
      FROM okx_rows WHERE price IS NOT NULL AND qty IS NOT NULL
      UNION ALL
      SELECT 'hyperliquid', 'usdc', symbol, side, qty, price,
             {notional_null}, ts_exch_ms
      FROM hl_rows
    )
    """


def unified_liquidations(spark: SparkSession) -> DataFrame:
    """All five venues normalized and unioned — the reference's fan-in
    (stream.py:169-188) as one batch DataFrame."""
    binance = normalize_binance(
        read_jsonl_frames(spark, str(_FIXTURES / "binance_force_order.jsonl"), _INGEST)
    )
    aster = normalize_aster(
        read_jsonl_frames(spark, str(_FIXTURES / "binance_force_order.jsonl"), _INGEST)
    )
    bybit = normalize_bybit(
        read_jsonl_frames(spark, str(_FIXTURES / "bybit_liquidation.jsonl"), _INGEST)
    )
    okx = normalize_okx(
        read_jsonl_frames(spark, str(_FIXTURES / "okx_liquidation_orders.jsonl"), _INGEST)
    )
    hl = normalize_hyperliquid(
        read_jsonl_frames(spark, str(_FIXTURES / "hyperliquid_fills.jsonl"), _INGEST)
    )
    return (
        binance.unionByName(aster)
        .unionByName(bybit)
        .unionByName(okx)
        .unionByName(hl)
    )


@register(
    "liq_normalize_unified",
    None,
    doc="five venue normalizers + union into the unified schema "
    "(SURVEY.md §2.2-§2.3; golden-tested in tests/test_normalizers.py). "
    "Rows-only FOREVER BY DESIGN: the raw column re-serializes venue "
    "JSON with engine-specific key ordering, so no portable value hash "
    "exists — its VALUE companion is liq_unified_rows, which oracles "
    "the other 9 of these 10 columns over the identical union.",
)
def liq_normalize_unified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unified_liquidations(spark)


@register(
    "liq_venue_stats",
    f"""
    WITH {_duck_liq_union()}
    SELECT exchange, market, side, COUNT(*)::BIGINT AS n,
           CAST(SUM(CAST(notional AS DECIMAL(25,6))) AS DOUBLE)
             AS total_notional
    FROM liq GROUP BY exchange, market, side
    """,
    doc="per-venue/side aggregate over the normalized union (console "
    "dashboard analogue of the reference's colored printer, K2) — full "
    "DuckDB oracle re-parses the fixture JSONL (see _duck_liq_union).",
)
def liq_venue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    liq = unified_liquidations(spark)
    return (
        liq.groupBy("exchange", "market", "side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("notional").alias("total_notional"),
        )
    )


@register(
    "liq_top_by_notional",
    f"""
    WITH {_duck_liq_union()}
    SELECT exchange, symbol, side, qty, price, notional, ts_exch_ms,
           rank::BIGINT AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY exchange
          ORDER BY notional DESC NULLS LAST, symbol ASC NULLS FIRST,
                   ts_exch_ms ASC NULLS FIRST) AS rank
      FROM liq
    ) WHERE rank <= 3
    """,
    doc="largest liquidations per venue (window top-k over the union) — "
    "the CHANGELOG's awk-dashboard analogue as a first-class query; "
    "DuckDB-oracled from the fixture JSONL.",
)
def liq_top_by_notional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    liq = unified_liquidations(spark)
    w = W.partitionBy("exchange").orderBy(
        F.desc_nulls_last("notional"), F.asc("symbol"), F.asc("ts_exch_ms")
    )
    return (
        liq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "exchange", "symbol", "side", "qty", "price", "notional",
            "ts_exch_ms", F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "liq_hourly_by_symbol",
    f"""
    WITH {_duck_liq_union()}
    SELECT date_trunc('hour', epoch_ms(ts_exch_ms)) AS hour,
           exchange, symbol, COUNT(*)::BIGINT AS n_liqs,
           CAST(SUM(CAST(notional AS DECIMAL(25,6))) AS DOUBLE)
             AS hourly_notional,
           MAX(qty) AS max_qty
    FROM liq WHERE ts_exch_ms IS NOT NULL
    GROUP BY hour, exchange, symbol
    """,
    doc="tumbling 1h event-time windows per symbol over the union — the "
    "streaming windowed-agg shape (q14) applied to the liquidation domain; "
    "DuckDB-oracled from the fixture JSONL.",
)
def liq_hourly_by_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    liq = unified_liquidations(spark)
    hour = F.date_trunc("hour", F.timestamp_millis(F.col("ts_exch_ms")))
    return (
        liq.filter(F.col("ts_exch_ms").isNotNull())
        .groupBy(hour.alias("hour"), "exchange", "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_liqs"),
            dsum("notional").alias("hourly_notional"),
            F.max("qty").alias("max_qty"),
        )
    )


@register(
    "liq_sixhour_dashboard",
    f"""
    WITH {_duck_liq_union()}
    SELECT epoch_ms((ts_exch_ms // 21600000) * 21600000) AS bucket_start,
           exchange, market,
           COUNT(*)::BIGINT AS n_liqs,
           SUM(CASE WHEN side = 'long' THEN 1 ELSE 0 END)::BIGINT AS n_long,
           SUM(CASE WHEN side = 'short' THEN 1 ELSE 0 END)::BIGINT AS n_short,
           CAST(SUM(CAST(notional AS DECIMAL(25,6))) AS DOUBLE)
             AS total_notional,
           MAX(notional) AS max_notional
    FROM liq WHERE ts_exch_ms IS NOT NULL
    GROUP BY bucket_start, exchange, market
    """,
    doc="the reference CHANGELOG's 6-hour awk dashboard as a first-class "
    "query (reference CHANGELOG.md:12-14 mentions 6-hour dashboards over "
    "the CSVs; the scripts are absent from the snapshot, so this is the "
    "canonical reconstruction): tumbling 6h event-time buckets per "
    "(exchange, market) with long/short breakdown and notional totals. "
    "Buckets are integer epoch-ms floor division — no engine-specific "
    "window-origin semantics — so the oracle is exact.",
)
def liq_sixhour_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    liq = unified_liquidations(spark)
    # integer `div`, matching the oracle's BIGINT floor division exactly
    bucket = F.timestamp_millis(
        F.expr("ts_exch_ms div 21600000") * F.lit(21_600_000)
    )
    return (
        liq.filter(F.col("ts_exch_ms").isNotNull())
        .groupBy(bucket.alias("bucket_start"), "exchange", "market")
        .agg(
            F.count(F.lit(1)).alias("n_liqs"),
            F.sum(F.when(F.col("side") == "long", 1).otherwise(0))
            .cast("long")
            .alias("n_long"),
            F.sum(F.when(F.col("side") == "short", 1).otherwise(0))
            .cast("long")
            .alias("n_short"),
            dsum("notional").alias("total_notional"),
            F.max("notional").alias("max_notional"),
        )
    )


_CASCADE_GAP_MS = 60_000


@register(
    "liq_cascades",
    f"""
    WITH {_duck_liq_union()},
    base AS (
      SELECT exchange, symbol, ts_exch_ms, notional
      FROM liq WHERE ts_exch_ms IS NOT NULL
    ),
    flagged AS (
      SELECT *, CASE WHEN LAG(ts_exch_ms) OVER w IS NULL
                       OR ts_exch_ms - LAG(ts_exch_ms) OVER w > {_CASCADE_GAP_MS}
                     THEN 1 ELSE 0 END AS ns
      FROM base
      WINDOW w AS (PARTITION BY exchange, symbol ORDER BY ts_exch_ms)
    ),
    numbered AS (
      SELECT *, SUM(ns) OVER (PARTITION BY exchange, symbol
                 ORDER BY ts_exch_ms
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT exchange, symbol,
           MIN(ts_exch_ms) AS cascade_start_ms,
           MAX(ts_exch_ms) AS cascade_end_ms,
           COUNT(*)::BIGINT AS n_liqs,
           CAST(SUM(CAST(notional AS DECIMAL(25,6))) AS DOUBLE)
             AS total_notional
    FROM numbered GROUP BY exchange, symbol, sid
    """,
    doc="liquidation-cascade detection: gap-based sessions (60 s) per "
    "(exchange, symbol) over the normalized union — consecutive "
    "liquidations closer than the gap chain into one cascade with its "
    "span, count and decimal-exact notional. The domain analytics the "
    "reference's consumers build downstream, here first-class and "
    "DuckDB-oracled (no tie-break needed: equal-ts rows chain into the "
    "same cascade whatever their order, and the outputs are order-free "
    "min/max/count/decimal-sum; same lag/cumsum spec as q15). Built on "
    "the hot-key-safe two-phase sessionize_bucketed: the event-level "
    "window partitions on (exchange, symbol, hour bucket) so one hot "
    "symbol on a cascade day — exactly when this query matters — is "
    "span/bucket parallel tasks, not one straggler; only boundary "
    "sessions take the small per-key merge pass. Output-equivalence of "
    "the two forms is pinned by tests/test_asof_skew.py and the "
    "unchanged oracle (decimal sums are exactly associative). The HOUR "
    "width is FIXED, not density-derived like q45/q47/q50 (VERDICT r7 "
    "item 7): the key is (exchange, symbol) — thousands of values — and "
    "per-task rows are bounded by one symbol's liquidation RATE x "
    "width, physically capped by matching-engine throughput (a "
    "sustained 100/s cascade storm, far beyond observed feeds, is "
    "~360k rows per (symbol, hour) task). Corpus growth adds symbols "
    "and days, not rows per (symbol, hour), so the extra derivation "
    "scan buys nothing here.",
)
def liq_cascades(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.sessionize import sessionize_bucketed

    liq = (
        unified_liquidations(spark)
        .filter(F.col("ts_exch_ms").isNotNull())
        .withColumn("__ts", F.timestamp_millis(F.col("ts_exch_ms")))
    )
    sessions = sessionize_bucketed(
        liq,
        on=["exchange", "symbol"],
        ts_col="__ts",
        gap_seconds=_CASCADE_GAP_MS // 1000,
        value_col="notional",
        tiebreak_col="ts_exch_ms",
        bucket_seconds=3600,
    )
    return sessions.select(
        "exchange",
        "symbol",
        F.unix_millis("session_start").alias("cascade_start_ms"),
        F.unix_millis("session_end").alias("cascade_end_ms"),
        F.col("n_events").cast("long").alias("n_liqs"),
        F.col("session_value").alias("total_notional"),
    )


_LIQ_RAW_SQL = f"""
    WITH raw_binance AS (
      SELECT unnest(string_split(content, chr(10))) AS value
      FROM read_text('{_FIXTURES.as_posix()}/binance_force_order.jsonl')
    ),
    bin_ev AS (
      SELECT unnest(json_transform(
               CASE WHEN json_type(value::JSON) = 'ARRAY' THEN value::JSON
                    ELSE ('[' || value || ']')::JSON END, '["JSON"]')) AS ev
      FROM raw_binance WHERE json_valid(value)
    ),
    kept AS (
      -- the same keep-filter as the normalizer: o present and non-empty,
      -- truthy-coalesced price/qty castable (binance_adapter.py:41-94)
      SELECT ev FROM bin_ev
      WHERE json_extract(ev::JSON, '$.o') IS NOT NULL
        AND json_extract(ev::JSON, '$.o') != 'null'::JSON
        AND json_extract(ev::JSON, '$.o') != '{{}}'::JSON
        AND TRY_CAST(COALESCE(
              NULLIF(json_extract_string(ev::JSON, '$.o.ap'), ''),
              NULLIF(json_extract_string(ev::JSON, '$.o.p'), ''),
              '0.0') AS DOUBLE) IS NOT NULL
        AND TRY_CAST(COALESCE(
              NULLIF(json_extract_string(ev::JSON, '$.o.l'), ''),
              NULLIF(json_extract_string(ev::JSON, '$.o.z'), ''),
              NULLIF(json_extract_string(ev::JSON, '$.o.q'), ''),
              '0.0') AS DOUBLE) IS NOT NULL
    ),
    m AS (
      SELECT json_extract_string(ev::JSON, '$.o.s') AS rs,
             TRY_CAST(json_extract_string(ev::JSON, '$.E') AS BIGINT) AS re
      FROM kept
    )
    SELECT ex.exchange,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rs IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_symbol_roundtrip,
           CAST(COUNT(re) AS BIGINT) AS n_with_event_ts,
           CAST(SUM(re) AS BIGINT) AS sum_event_ts
    FROM m CROSS JOIN (VALUES ('binance'), ('aster')) ex(exchange)
    GROUP BY ex.exchange
    """


@register(
    "liq_raw_variant",
    _LIQ_RAW_SQL,
    doc="VARIANT analytics over the raw JSON column (SURVEY.md §1.4's "
    "Spark-4 mapping for the reference's JSONB `raw`; consumers of "
    "writer_pg.py query raw in Postgres the same way): parse_json turns "
    "raw into a VariantType once, then try_variant_get path extraction "
    "checks the normalize/serialize round-trip — extracted $.o.s must "
    "equal the symbol column wherever the wire carried a symbol — and "
    "aggregates the $.E event timestamps (exact BIGINT sums). Binance + "
    "aster arms (their raw is the whole wire event). The oracle "
    "re-derives the same numbers from the original fixture JSONL with "
    "DuckDB's JSON functions — path extraction is insensitive to the "
    "documented struct-order/dropped-null-keys deviation of raw.",
)
def liq_raw_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    liq = unified_liquidations(spark).filter(
        F.col("exchange").isin("binance", "aster")
    )
    v = liq.select(
        "exchange",
        "symbol",
        F.parse_json("raw").alias("v"),
    ).select(
        "exchange",
        "symbol",
        F.expr("try_variant_get(v, '$.o.s', 'string')").alias("rs"),
        F.expr("try_variant_get(v, '$.E', 'bigint')").alias("re"),
    )
    return v.groupBy("exchange").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("rs") == F.col("symbol"), 1).otherwise(0)
        ).cast("long").alias("n_symbol_roundtrip"),
        F.count("re").cast("long").alias("n_with_event_ts"),
        F.sum("re").cast("long").alias("sum_event_ts"),
    )


@register(
    "liq_unified_rows",
    f"""
    WITH {_duck_liq_union()}
    SELECT exchange, market, symbol, side, qty, price, notional,
           ts_exch_ms, CAST({_INGEST} AS BIGINT) AS ts_ingest_ms
    FROM liq
    """,
    doc="the five-venue normalize-and-union fan-in ROW SET itself "
    "(unified_liquidations minus the raw column), value-gated: the "
    "oracle re-parses the same fixture JSONL in DuckDB SQL and "
    "reproduces every normalizer semantic per row — flatten modes, "
    "truthy coalesce chains, try-cast drop/keep rules, side maps, "
    "bybit dual-schema + us->ms, the HL ts heuristic and "
    "tid|user|coin dedup — so 9 of the 10 unified-schema columns pass "
    "rows+schema+hash (ts_ingest pinned). Only `raw` (typed-struct "
    "re-serialization order, documented N21 deviation) stays "
    "golden-tested; liq_normalize_unified keeps the full 10-column "
    "surface as the rows-only companion.",
)
def liq_unified_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unified_liquidations(spark).drop("raw")
