#!/usr/bin/env python
"""Derive the r14 scale-evidence tier (VERDICT r13 item 4): a ~10x
fixture deterministically derived from sf0.1 so the low-core/high-core
bench ratio can separate parallel from scheduling-bound work — sf0.1
(~600k lineitem rows) is task-scheduling-bound at 32 cores (every r13
scaling ratio read 0.45-1.02, i.e. 8 cores >= 32 cores).

Derivation: the fact tables (lineitem, orders, events, documents) are
unioned 10x with primary keys shifted by i * 10^9 per copy (foreign
keys into the dimension tables are left untouched so every join still
resolves); dimensions are copied verbatim. Fully deterministic — no
randomness, no timestamps. Output: $OUT_DIR (default /root/scale10).

This is INPUT data for measurement scripts (tools_r14/exp.py with
SPARK_GRAFT_SF_DIR pointed here); the driver bench contract and
/root/testdata are untouched.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from liq_stream_spark.session import get_spark  # noqa: E402

SHIFT = 10**9
COPIES = int(os.environ.get("LIQ_SCALE_COPIES", "10"))
ONLY = set(
    t for t in os.environ.get("LIQ_SCALE_ONLY", "").split(",") if t
)
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}
DIMS = [
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
    "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/scale10"
    spark = get_spark(
        app_name="liq_r14_make_scale10",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(out, exist_ok=True)
    for t, keys in FACTS.items():
        if ONLY and t not in ONLY:
            continue
        df = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            parts.append(c)
        big = parts[0]
        for c in parts[1:]:
            big = big.unionAll(c)
        big.repartition(max(8, COPIES)).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())
    for t in DIMS + [t for t in FACTS if ONLY and t not in ONLY]:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(t, "copied")
    spark.stop()


if __name__ == "__main__":
    main()
