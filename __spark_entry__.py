"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator as (spark, sf_dir) -> DataFrame; ``oracle_sql()``
gives the DuckDB-equivalent SQL per query. 124 of 126 entries are oracled;
the two rows-only remainders each have an inherent reason (the full
10-column normalizer union's ``raw`` re-serialization is wire-format-
specific — its 9 value-checkable columns are oracled via
``liq_unified_rows`` — and q30's sketches are engine-specific, with exact
companions oracled) and their correctness gates are the golden tests in
tests/.

All real logic lives in the liq_stream_spark package (plans/ registry);
this module is a thin adapter over it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from liq_stream_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: region/nation revenue rollup (join chain + agg) at sf0.001."""
    return REGISTRY["q03_region_revenue"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # iteration order IS the harness's bounded-budget sampling order:
    # changed-since-green queries first, then stalest driver signal first
    # (plans/priority.py documents the rules)
    from liq_stream_spark.plans.priority import verification_order

    return {name: REGISTRY[name].build for name in verification_order()}


def oracle_sql() -> dict[str, str]:
    from liq_stream_spark.plans.priority import verification_order

    return {
        name: REGISTRY[name].oracle
        for name in verification_order()
        if REGISTRY[name].oracle is not None
    }
