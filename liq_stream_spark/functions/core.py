"""Scalar expression helpers replicating the reference's per-row semantics.

All are pure Column combinators (JVM-side, whole-stage-codegen'd) — no UDFs.

The tricky one is Python truthiness coalescing (SURVEY.md §7.4 #1): the
reference writes ``o.get("ap") or o.get("p") or 0.0`` over *string* wire
values, so ``""`` and ``None`` fall through but the string ``"0"`` (truthy)
does not. SQL ``coalesce`` only skips NULL — we replicate the exact semantics
with ``nullif`` on the empty string.
(reference: binance_adapter.py:73-74, bybit_adapter.py:195-196,
okx_adapter.py:85-86)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str | float | int) -> Column:
    if isinstance(c, Column):
        return c
    if isinstance(c, str):
        return F.col(c)
    return F.lit(c)


def truthy_coalesce(*cols: Column | str | float | int) -> Column:
    """First argument that is neither NULL nor the empty string.

    Mirrors a Python ``a or b or c`` chain over string wire values
    (binance_adapter.py:73-74). Note ``"0"`` is truthy in Python and is
    therefore *kept*, unlike numeric-0 falsiness — the reference coalesces
    before the float() cast, and so do we.
    """
    return F.coalesce(*[F.nullif(_as_col(c), F.lit("")) for c in cols])


def truthy_double(*cols: Column | str | float | int) -> Column:
    """``float(a or b or 0.0)`` — truthy-coalesce then cast to double.

    ``try_cast`` yields NULL where the reference's ``float()`` would raise
    (callers decide whether that skips the row, as binance_adapter.py:93-94
    does, or yields 0.0, as bybit's _to_float at bybit_adapter.py:17-21 does).
    """
    return truthy_coalesce(*cols).try_cast("double")


def truthy_long(*cols: Column | str | float | int) -> Column:
    return truthy_coalesce(*cols).try_cast("long")


def now_ms() -> Column:
    """Epoch milliseconds at evaluation time (reference _now_ms, e.g.
    binance_adapter.py:13-14)."""
    return F.unix_millis(F.current_timestamp())


def to_ms(c: Column | str) -> Column:
    """The Hyperliquid timestamp heuristic (hyperliquid_adapter.py:14-36):

    numeric < 1e12  -> seconds, multiply by 1000
    numeric >= 1e12 -> already ms
    else ISO-8601 (optionally 'Z'-suffixed) -> epoch ms
    else NULL
    """
    col = _as_col(c)
    num = col.try_cast("double")
    # try_to_timestamp: Spark 4 defaults to ANSI mode, where to_timestamp
    # raises on malformed input; the reference returns None instead.
    iso = F.try_to_timestamp(F.rtrim(F.regexp_replace(col.cast("string"), "Z$", "")))
    return (
        F.when(num.isNotNull() & (num < 1e12), (num * 1000).cast("long"))
        .when(num.isNotNull(), num.cast("long"))
        .otherwise(F.unix_millis(iso))
    )


def side_from_order_side(c: Column | str) -> Column:
    """Binance/Aster order side -> liquidated position side
    (binance_adapter.py:16-23): BUY closes shorts, SELL closes longs."""
    s = F.upper(F.coalesce(_as_col(c), F.lit("")))
    return (
        F.when(s == "BUY", F.lit("short"))
        .when(s == "SELL", F.lit("long"))
        .otherwise(F.lit(None).cast("string"))
    )


def side_from_bybit(c: Column | str) -> Column:
    """Bybit side -> long/short, else empty string (bybit_adapter.py:191-192)."""
    s = F.lower(F.coalesce(_as_col(c), F.lit("")))
    return (
        F.when(s == "buy", F.lit("short"))
        .when(s == "sell", F.lit("long"))
        .otherwise(F.lit(""))
    )


def side_from_okx(c: Column | str) -> Column:
    """OKX posSide kept iff in {long, short}, else empty string
    (okx_adapter.py:82-83)."""
    s = F.lower(F.coalesce(_as_col(c), F.lit("")))
    return F.when(s.isin("long", "short"), s).otherwise(F.lit(""))


def side_from_hl(dir_col: Column | str, side_col: Column | str) -> Column:
    """Hyperliquid: classify from 'dir' substring, fall back to side A/B,
    then map Long/Short -> long/short else NULL
    (hyperliquid_adapter.py:38-60)."""
    d = F.lower(F.coalesce(_as_col(dir_col), F.lit("")))
    s = F.upper(F.coalesce(_as_col(side_col), F.lit("")))
    kind = (
        F.when(d.contains("close long"), F.lit("Long"))
        .when(d.contains("close short"), F.lit("Short"))
        .when(s == "A", F.lit("Long"))
        .when(s == "B", F.lit("Short"))
        .otherwise(F.lit("Unknown"))
    )
    return (
        F.when(kind == "Long", F.lit("long"))
        .when(kind == "Short", F.lit("short"))
        .otherwise(F.lit(None).cast("string"))
    )


def notional(
    price: Column, qty: Column, default: Column | None = None
) -> Column:
    """``price * qty if price and qty else <default>`` — numeric truthiness:
    NULL or 0.0 on either side yields the default (None for binance/okx/HL at
    binance_adapter.py:78, 0.0 for bybit at bybit_adapter.py:197)."""
    if default is None:
        default = F.lit(None).cast("double")
    good = price.isNotNull() & (price != 0.0) & qty.isNotNull() & (qty != 0.0)
    return F.when(good, price * qty).otherwise(default)


def compact_json(struct_col: Column) -> Column:
    """Compact JSON (no spaces), mirroring ``json.dumps(..., separators=(",",":"))``
    (binance_adapter.py:90). ``to_json`` is already compact and drops NULL
    fields like the original dicts lack missing keys."""
    return F.to_json(struct_col)


def qround(c: Column, scale: int) -> Column:
    """Cross-engine-deterministic half-up quantization of a double:
    ``floor(x * 10^scale + 0.5) / 10^scale``.

    Engine-native ``round(double, n)`` is NOT portable at half
    boundaries — Spark rounds through BigDecimal (exact decimal
    expansion, HALF_UP) while DuckDB multiplies and ``nearbyint``s
    (float-domain, half-even) — so two engines given bit-identical
    doubles can emit values 10^-scale apart (observed: ~2% of PageRank
    ranks at scale 12). floor/multiply/add are individually exact IEEE
    ops, so this form is a pure function of the input BITS and agrees
    everywhere. SQL mirror: ``floor(x * 1e<scale> + 0.5) / 1e<scale>``.

    Use for DERIVED floats that feed an oracle comparison; exact
    decimal paths (tables.dsum) don't need it."""
    m = F.lit(float(10**scale))
    return F.floor(c * m + F.lit(0.5)) / m


def qfloor_long(c: Column, scale: int) -> Column:
    """The integer-domain form of :func:`qround`:
    ``floor(x * 10^scale + 0.5)`` as a BIGINT — for pipelines that keep
    accumulating after quantization (sums of longs are exact and
    task-order-free, which even DECIMAL can't beat for portability).
    SQL mirror: ``CAST(floor(x * 1e<scale> + 0.5) AS BIGINT)``."""
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5))
