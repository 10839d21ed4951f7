#!/usr/bin/env python
"""Round-14 PageRank lab (VERDICT r13 item 3): interleaved A/B of the
r13 pagerank shape (checkpointed un-partitioned edge pin, no broadcast
gate) vs the r14 operator, on g01's exact inputs. Asserts bit-equal
results first (pico-rank longs are exact, so a full frame checksum is
well-defined).

Usage: python tools_r14/pr_lab.py [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from liq_stream_spark.functions.core import qfloor_long  # noqa: E402
from liq_stream_spark.operators.graph import SCALE, pagerank  # noqa: E402
from liq_stream_spark.plans import REGISTRY  # noqa: E402
from liq_stream_spark.session import get_spark  # noqa: E402


def pagerank_r13(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    id_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Verbatim copy of the r13 implementation (commit ad82395)."""
    nd = (
        nodes.select(F.col(id_col).alias("node_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nd.count()
    if n == 0:
        return nd.select(
            "node_id",
            F.lit(0).cast("long").alias("out_deg"),
            F.lit(0.0).alias("pr"),
        )
    teleport = qfloor_long(F.lit(1.0 - damping) / F.lit(float(n)), SCALE)
    r0 = qfloor_long(F.lit(1.0) / F.lit(float(n)), SCALE)

    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .join(nd.select(F.col("node_id").alias("src")), "src", "left_semi")
        .join(nd.select(F.col("node_id").alias("dst")), "dst", "left_semi")
        .localCheckpoint(eager=False)
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=False)
    )

    ranks = nd.withColumn("r", r0)
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e.src == ranks.node_id)
            .join(deg, "src")
            .select(
                F.col("dst"),
                F.floor(
                    F.col("r") / F.col("out_deg") + F.lit(0.5)
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        base = ranks.select("node_id")
        ranks = (
            base.join(contrib, base.node_id == contrib.dst, "left")
            .select(
                "node_id",
                F.floor(
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0))
                    + F.lit(0.5)
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.join(deg, ranks.node_id == deg.src, "left").select(
        "node_id",
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        (F.col("r") / F.lit(float(10**SCALE))).alias("pr"),
    )


def pagerank_pin(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    id_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """r13 joins, r14 pins (repartition+sort+persist e, persist deg) —
    no broadcast gate."""
    nd = (
        nodes.select(F.col(id_col).alias("node_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nd.count()
    if n == 0:
        return nd.select(
            "node_id",
            F.lit(0).cast("long").alias("out_deg"),
            F.lit(0.0).alias("pr"),
        )
    teleport = qfloor_long(F.lit(1.0 - damping) / F.lit(float(n)), SCALE)
    r0 = qfloor_long(F.lit(1.0) / F.lit(float(n)), SCALE)

    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .join(nd.select(F.col("node_id").alias("src")), "src", "left_semi")
        .join(nd.select(F.col("node_id").alias("dst")), "dst", "left_semi")
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .persist()
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .persist()
    )

    ranks = nd.withColumn("r", r0)
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e.src == ranks.node_id)
            .join(deg, "src")
            .select(
                F.col("dst"),
                F.floor(
                    F.col("r") / F.col("out_deg") + F.lit(0.5)
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        base = ranks.select("node_id")
        ranks = (
            base.join(contrib, base.node_id == contrib.dst, "left")
            .select(
                "node_id",
                F.floor(
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0))
                    + F.lit(0.5)
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.join(deg, ranks.node_id == deg.src, "left").select(
        "node_id",
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        (F.col("r") / F.lit(float(10**SCALE))).alias("pr"),
    )


def _persistent_ids(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def _cleanup(spark, keep_ids: set) -> None:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(m.keySet()):
        if rid not in keep_ids:
            try:
                m.get(rid).unpersist(False)
            except Exception:
                pass
    spark.catalog.clearCache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    spark = get_spark(
        app_name="liq_r14_pr_lab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    import liq_stream_spark.operators.graph as Gmod

    g01 = REGISTRY["g01_pagerank"]
    keep = _persistent_ids(spark)

    def run_new() -> DataFrame:
        return g01.build(spark, args.sf_dir)

    times: dict[str, list[float]] = {"old": [], "pin": [], "new": []}

    def _with(fn):
        orig = Gmod.pagerank
        Gmod.pagerank = fn
        try:
            return g01.build(spark, args.sf_dir)
        finally:
            Gmod.pagerank = orig

    def build_old() -> DataFrame:
        return _with(pagerank_r13)

    def build_pin() -> DataFrame:
        return _with(pagerank_pin)

    # equality: pico-exact → full frame compare via checksum
    def checksum(df: DataFrame) -> list:
        return list(
            df.agg(
                F.count(F.lit(1)),
                F.sum("node_id"),
                F.sum("out_deg"),
                F.sum(
                    F.xxhash64(
                        "node_id",
                        "out_deg",
                        F.col("pr").cast("decimal(28,18)"),
                    ).cast("decimal(38,0)")
                ),
            ).collect()[0]
        )

    c_new = checksum(run_new())
    _cleanup(spark, keep)
    c_old = checksum(build_old())
    _cleanup(spark, keep)
    c_pin = checksum(build_pin())
    _cleanup(spark, keep)
    assert c_new == c_old == c_pin, (
        f"results differ: old={c_old} pin={c_pin} new={c_new}"
    )

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    for _ in range(args.reps):
        times["old"].append(round(timed(build_old), 3))
        _cleanup(spark, keep)
        times["pin"].append(round(timed(build_pin), 3))
        _cleanup(spark, keep)
        times["new"].append(round(timed(run_new), 3))
        _cleanup(spark, keep)

    out = {k: {"min": min(v), "runs": v} for k, v in times.items()}
    out["_checksum_equal"] = True
    try:
        l1, l5, _ = os.getloadavg()
        out["_load"] = [round(l1, 2), round(l5, 2)]
    except OSError:
        pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
