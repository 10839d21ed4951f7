"""Aster forceOrder normalizer.

Aster's wire protocol is Binance-identical (aster_adapter.py:35-89 mirrors
binance_adapter.py:41-94); the venue is USDT-only — market is forced to
"usdt" regardless of configuration (aster_adapter.py:30-31). Reuse the
Binance transform with the exchange/market constants swapped (N19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from liq_stream_spark.operators.normalize_binance import normalize_binance


def normalize_aster(frames: DataFrame, market: str = "usdt") -> DataFrame:
    # market argument accepted for CLI parity but always coerced to usdt
    return normalize_binance(frames, market="usdt", exchange="aster")
