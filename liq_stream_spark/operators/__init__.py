from liq_stream_spark.operators.normalize_binance import normalize_binance
from liq_stream_spark.operators.normalize_aster import normalize_aster
from liq_stream_spark.operators.normalize_bybit import normalize_bybit
from liq_stream_spark.operators.normalize_okx import normalize_okx
from liq_stream_spark.operators.normalize_hyperliquid import normalize_hyperliquid

__all__ = [
    "normalize_binance",
    "normalize_aster",
    "normalize_bybit",
    "normalize_okx",
    "normalize_hyperliquid",
]
