from liq_stream_spark.functions.core import (
    truthy_coalesce,
    truthy_double,
    truthy_long,
    to_ms,
    now_ms,
    side_from_order_side,
    side_from_bybit,
    side_from_okx,
    side_from_hl,
    notional,
    compact_json,
)

__all__ = [
    "truthy_coalesce",
    "truthy_double",
    "truthy_long",
    "to_ms",
    "now_ms",
    "side_from_order_side",
    "side_from_bybit",
    "side_from_okx",
    "side_from_hl",
    "notional",
    "compact_json",
]
