"""The analytics query library — the driver-facing operator surface.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL for the DuckDB oracle (None for operators whose
semantics aren't SQL-expressible; the driver then records a rows-only check).

Registry keys are stable public names; ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a silent overwrite would leave the ledger/harness vouching
            # for different code under the old entry's green rows —
            # exactly the stale-green failure mode priority.py prevents
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# importing the modules populates REGISTRY
from liq_stream_spark.plans import relational  # noqa: E402,F401
from liq_stream_spark.plans import relational2  # noqa: E402,F401
from liq_stream_spark.plans import relational3  # noqa: E402,F401
from liq_stream_spark.plans import events  # noqa: E402,F401
from liq_stream_spark.plans import liquidations  # noqa: E402,F401
from liq_stream_spark.plans import llm_ops  # noqa: E402,F401
from liq_stream_spark.plans import llm_ops2  # noqa: E402,F401
from liq_stream_spark.plans import relational4  # noqa: E402,F401
from liq_stream_spark.plans import relational5  # noqa: E402,F401
from liq_stream_spark.plans import llm_ops3  # noqa: E402,F401
from liq_stream_spark.plans import llm_ops4  # noqa: E402,F401
from liq_stream_spark.plans import relational6  # noqa: E402,F401
from liq_stream_spark.plans import llm_ops5  # noqa: E402,F401
from liq_stream_spark.plans import relational7  # noqa: E402,F401

# REGISTRY iterates in registration order for every in-library consumer.
# The external correctness harness samples entries in the order
# `__spark_entry__.queries()` yields them with a bounded budget (~50), so
# the harness-facing adapter — and ONLY the adapter — applies the explicit
# verification-priority ordering from liq_stream_spark.plans.priority
# (changed-since-green first, then by staleness of the latest driver
# signal). The ordering lives outside the registry so library iteration
# order never couples to the evaluator (ADVICE r3).
