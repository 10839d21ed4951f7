#!/usr/bin/env python
"""Round-13 optimization experiment harness.

Usage:
  python tools_r14/exp.py time q01_pricing_summary q03_region_revenue [--runs 3]
  python tools_r14/exp.py explain q01_pricing_summary [--out plans/r14 --suffix before]

Times each named query with the same methodology as bench.py (noop sink,
warm min-of-N after a session warm-up) and prints one JSON line; or dumps
.explain("formatted") to a file per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liq_stream_spark.plans import REGISTRY  # noqa: E402
from liq_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "explain"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(
        app_name="liq_r14_exp",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf_dir = args.sf_dir

    if args.mode == "explain":
        os.makedirs(args.out, exist_ok=True)
        for name in args.queries:
            df = REGISTRY[name].build(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(path)
        spark.stop()
        return

    # warm-up (same as bench.py: scan + Python/Arrow worker pool)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    from liq_stream_spark.operators.similarity import cosine_fast

    (
        spark.range(1000)
        .select(F.array(F.rand(), F.rand()).alias("a"))
        .select(cosine_fast("a", "a"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    def run_query(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].build(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    out: dict[str, object] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"r14exp:{name}")
        ts = [round(run_query(name), 3) for _ in range(args.runs)]
        out[name] = {"min": min(ts), "runs": ts}
    try:
        load1, load5, _ = os.getloadavg()
        out["_load"] = [round(load1, 2), round(load5, 2)]
    except OSError:
        pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
