#!/usr/bin/env python
"""Round-14 connected-components loop lab (VERDICT r13 item 1).

Builds d14's verified pair list ONCE (eager pin so every arm shares the
same materialized input), then times loop variants interleaved
(A,B,A,B,...) and asserts their label sets are identical.

Usage:
  python tools_r14/cc_lab.py rounds            # per-round timing + changed counts (current loop)
  python tools_r14/cc_lab.py ab A B [--reps 5] # interleaved A/B of named variants
  python tools_r14/cc_lab.py explain V --out f # dump a generic-round plan for variant V
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from liq_stream_spark.operators import dedup as D  # noqa: E402
from liq_stream_spark.plans.tables import load  # noqa: E402
from liq_stream_spark.session import get_spark  # noqa: E402

_D14_MIN_AGREE = 8


def build_pairs(spark, sf_dir: str) -> DataFrame:
    sigs = D.minhash_sig_arrays(load(spark, sf_dir, "documents"))
    verified = D.lsh_candidate_pairs_banded(
        sigs, max_bucket=None, min_agree=_D14_MIN_AGREE
    )
    return verified.localCheckpoint()  # eager: shared by every arm


def _symmetric_edges(
    pairs: DataFrame, parts: int, sort: bool = False
) -> DataFrame:
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint(eager=False)
    edges = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges = edges.repartition(parts, "dst")
    if sort:
        edges = edges.sortWithinPartitions("dst")
    return edges.localCheckpoint(eager=False)


def loop_current(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    return D._cc_loop(edges, max_iters)


def loop_r13(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Verbatim copy of the r13 _cc_loop (commit ad82395)."""
    labels = None
    for _ in range(max_iters):
        if labels is None:
            stepped = edges.groupBy("src").agg(
                F.min("dst").alias("__m")
            ).select(
                F.col("src").alias("node"),
                F.least(F.col("src"), F.col("__m")).alias("comp"),
                F.col("src").alias("__old"),
            )
        else:
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = (
                labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce("nbr_comp", "comp")
                    ).alias("comp"),
                    F.col("comp").alias("__old"),
                )
            )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = (
            stepped.join(hop, stepped["comp"] == hop["h_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("h_comp", "comp")
                ).alias("comp"),
                "__old",
            )
        )
        compressed = compressed.localCheckpoint(eager=False)
        changed = compressed.filter(F.col("comp") != F.col("__old")).count()
        labels = compressed.select("node", "comp")
        if changed == 0:
            break
    if labels is None:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("comp"))
        )
    return labels


def loop_copart(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Labels kept hash-partitioned on node across rounds."""
    labels = None
    for _ in range(max_iters):
        if labels is None:
            stepped = (
                edges.groupBy("src")
                .agg(F.min("dst").alias("__m"))
                .select(
                    F.col("src").alias("node"),
                    F.least(F.col("src"), F.col("__m")).alias("comp"),
                    F.col("src").alias("__old"),
                )
            )
        else:
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = labels.join(
                nbr_min, labels["node"] == nbr_min["src"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                    "comp"
                ),
                F.col("comp").alias("__old"),
            )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = stepped.join(
            hop, stepped["comp"] == hop["h_node"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias("comp"),
            "__old",
        )
        compressed = compressed.repartition(F.col("node")).localCheckpoint(
            eager=False
        )
        changed = compressed.filter(F.col("comp") != F.col("__old")).count()
        labels = compressed.select("node", "comp")
        if changed == 0:
            break
    return labels


def loop_delta(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Round 2+ propagates only labels that CHANGED last round: a node's
    min-label can only arrive through a neighbor whose label dropped, so
    the step join's label side shrinks to the delta frame (tiny for
    shallow dedup graphs) and AQE broadcast-joins it against the pinned
    edges — no edge-side shuffle at all."""
    labels = None
    delta = None
    for _ in range(max_iters):
        if labels is None:
            stepped = (
                edges.groupBy("src")
                .agg(F.min("dst").alias("__m"))
                .select(
                    F.col("src").alias("node"),
                    F.least(F.col("src"), F.col("__m")).alias("comp"),
                    F.col("src").alias("__old"),
                )
            )
        else:
            nbr_min = (
                edges.join(delta, edges["dst"] == delta["d_node"])
                .groupBy("src")
                .agg(F.min("d_comp").alias("nbr_comp"))
            )
            stepped = labels.join(
                nbr_min, labels["node"] == nbr_min["src"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                    "comp"
                ),
                F.col("comp").alias("__old"),
            )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = stepped.join(
            hop, stepped["comp"] == hop["h_node"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias("comp"),
            "__old",
        )
        compressed = compressed.localCheckpoint(eager=False)
        changed = compressed.filter(F.col("comp") != F.col("__old")).count()
        labels = compressed.select("node", "comp")
        delta = (
            compressed.filter(F.col("comp") != F.col("__old"))
            .select(
                F.col("node").alias("d_node"), F.col("comp").alias("d_comp")
            )
        )
        if changed == 0:
            break
    return labels


def loop_dualhop(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Two pointer-jump hops per round (comp -> label(comp) ->
    label(label(comp))): each hop is a label-sized join, but path
    compression quadruples per round so shallow graphs converge in
    fewer rounds (and rounds, not joins, carry the fixed job/stage
    overhead at fixture scale and the lineage-pin cost at 100 TB)."""
    labels = None
    for _ in range(max_iters):
        if labels is None:
            stepped = (
                edges.groupBy("src")
                .agg(F.min("dst").alias("__m"))
                .select(
                    F.col("src").alias("node"),
                    F.least(F.col("src"), F.col("__m")).alias("comp"),
                    F.col("src").alias("__old"),
                )
            )
        else:
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = labels.join(
                nbr_min, labels["node"] == nbr_min["src"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                    "comp"
                ),
                F.col("comp").alias("__old"),
            )
        for _hop in range(2):
            hop = stepped.select(
                F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
            )
            stepped = stepped.join(
                hop, stepped["comp"] == hop["h_node"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias(
                    "comp"
                ),
                "__old",
            )
        compressed = _pin_lazy(stepped)
        changed = compressed.filter(F.col("comp") != F.col("__old")).count()
        labels = compressed.select("node", "comp")
        if changed == 0:
            break
    return labels


def _pin_lazy(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=False)


def loop_lazyconf(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Convergence checked every SECOND round: the odd round's pin stays
    lazy and materializes inside the even round's count job — halves the
    per-round action/job barriers (two rounds execute as one job)."""
    labels = None
    pending = None
    for r in range(max_iters):
        if labels is None:
            stepped = (
                edges.groupBy("src")
                .agg(F.min("dst").alias("__m"))
                .select(
                    F.col("src").alias("node"),
                    F.least(F.col("src"), F.col("__m")).alias("comp"),
                    F.col("src").alias("__old"),
                )
            )
        else:
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = labels.join(
                nbr_min, labels["node"] == nbr_min["src"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                    "comp"
                ),
                F.col("comp").alias("__old"),
            )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = stepped.join(
            hop, stepped["comp"] == hop["h_node"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias("comp"),
            "__old",
        )
        compressed = compressed.localCheckpoint(eager=False)
        labels = compressed.select("node", "comp")
        if pending is None:
            pending = compressed  # defer this round's convergence check
        else:
            changed = (
                pending.filter(F.col("comp") != F.col("__old"))
                .union(compressed.filter(F.col("comp") != F.col("__old")))
                .count()
            )
            pending = None
            if changed == 0:
                break
    if pending is not None:
        pending.filter(F.col("comp") != F.col("__old")).count()
    return labels


def loop_bcast(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Label-sized sides carried as explicit broadcasts: the step join
    probes the pinned edges with broadcast(labels) (no exchange on
    either side), the stepped and compression joins build their
    label-sized right sides as broadcasts too — one exchange per round
    (the groupBy(src) partial agg) instead of 3-4 + AQE conversions.
    Only valid when the label frame is provably broadcast-small; the
    caller gates on the edge count."""
    labels = None
    for _ in range(max_iters):
        if labels is None:
            stepped = (
                edges.groupBy("src")
                .agg(F.min("dst").alias("__m"))
                .select(
                    F.col("src").alias("node"),
                    F.least(F.col("src"), F.col("__m")).alias("comp"),
                    F.col("src").alias("__old"),
                )
            )
        else:
            nbr_min = (
                edges.join(
                    F.broadcast(labels), edges["dst"] == labels["node"]
                )
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = labels.join(
                F.broadcast(nbr_min), labels["node"] == nbr_min["src"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                    "comp"
                ),
                F.col("comp").alias("__old"),
            )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = stepped.join(
            F.broadcast(hop), stepped["comp"] == hop["h_node"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias("comp"),
            "__old",
        )
        compressed = compressed.localCheckpoint(eager=False)
        changed = compressed.filter(F.col("comp") != F.col("__old")).count()
        labels = compressed.select("node", "comp")
        if changed == 0:
            break
    return labels


def loop_bcast_delta(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """bcast + delta: the step join's build side is only the labels that
    CHANGED last round (broadcast); labels-sized sides broadcast."""
    labels = None
    delta = None
    for _ in range(max_iters):
        if labels is None:
            stepped = (
                edges.groupBy("src")
                .agg(F.min("dst").alias("__m"))
                .select(
                    F.col("src").alias("node"),
                    F.least(F.col("src"), F.col("__m")).alias("comp"),
                    F.col("src").alias("__old"),
                )
            )
        else:
            nbr_min = (
                edges.join(
                    F.broadcast(delta), edges["dst"] == delta["d_node"]
                )
                .groupBy("src")
                .agg(F.min("d_comp").alias("nbr_comp"))
            )
            stepped = labels.join(
                F.broadcast(nbr_min), labels["node"] == nbr_min["src"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                    "comp"
                ),
                F.col("comp").alias("__old"),
            )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = stepped.join(
            F.broadcast(hop), stepped["comp"] == hop["h_node"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias("comp"),
            "__old",
        )
        compressed = compressed.localCheckpoint(eager=False)
        changed = compressed.filter(F.col("comp") != F.col("__old")).count()
        labels = compressed.select("node", "comp")
        delta = compressed.filter(F.col("comp") != F.col("__old")).select(
            F.col("node").alias("d_node"), F.col("comp").alias("d_comp")
        )
        if changed == 0:
            break
    return labels


# name -> (loop fn, sorted edge pin)
VARIANTS = {
    "current": (loop_current, False),
    "r13": (loop_r13, False),
    "copart": (loop_copart, False),
    "delta": (loop_delta, False),
    "dualhop": (loop_dualhop, False),
    "lazyconf": (loop_lazyconf, False),
    "bcast": (loop_bcast, False),
    "sorted": (loop_current, True),
    "bds": (loop_bcast_delta, True),
    "bcast_sorted": (loop_bcast, True),
}


def _persistent_ids(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def _cleanup(spark, keep_ids: set) -> None:
    """Unpersist localCheckpoint RDDs leaked by a rep (keeping the shared
    input pins) so block-store growth doesn't contaminate later arms."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(m.keySet()):
        if rid not in keep_ids:
            try:
                m.get(rid).unpersist(False)
            except Exception:
                pass


def _labels_for(spark, pairs: DataFrame, name: str) -> DataFrame:
    if name == "prod":
        return D.connected_components(pairs)
    fn, sort = VARIANTS[name]
    session_sp = spark.conf.get("spark.sql.shuffle.partitions")
    n_edges = pairs.count() * 2
    parts = max(1, min(int(session_sp), n_edges // 100_000 + 1))
    edges = _symmetric_edges(pairs, parts, sort)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        return fn(edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", session_sp)


def run_variant(spark, pairs: DataFrame, name: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    labels = _labels_for(spark, pairs, name)
    n = labels.count()
    return time.perf_counter() - t0, n


def checksum(spark, pairs: DataFrame, name: str) -> list:
    row = (
        _labels_for(spark, pairs, name)
        .agg(
            F.count(F.lit(1)),
            F.sum(F.col("node")),
            F.sum(F.col("comp")),
            F.sum(F.xxhash64("node", "comp").cast("decimal(38,0)")),
        )
        .collect()[0]
    )
    return list(row)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["rounds", "ab", "explain"])
    ap.add_argument("variants", nargs="*", default=[])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="liq_r14_cc_lab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    pairs = build_pairs(spark, args.sf_dir)
    print(json.dumps({"n_pairs": pairs.count()}), file=sys.stderr)

    if args.mode == "rounds":
        # instrumented copy of the current loop: per-round wall + changed
        session_sp = spark.conf.get("spark.sql.shuffle.partitions")
        n_edges = pairs.count() * 2
        parts = max(1, min(int(session_sp), n_edges // 100_000 + 1))
        edges = _symmetric_edges(pairs, parts)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        rounds = []
        labels = None
        for r in range(25):
            t0 = time.perf_counter()
            if labels is None:
                stepped = (
                    edges.groupBy("src")
                    .agg(F.min("dst").alias("__m"))
                    .select(
                        F.col("src").alias("node"),
                        F.least(F.col("src"), F.col("__m")).alias("comp"),
                        F.col("src").alias("__old"),
                    )
                )
            else:
                nbr_min = (
                    edges.join(labels, edges["dst"] == labels["node"])
                    .groupBy("src")
                    .agg(F.min("comp").alias("nbr_comp"))
                )
                stepped = labels.join(
                    nbr_min, labels["node"] == nbr_min["src"], "left"
                ).select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce("nbr_comp", "comp")
                    ).alias("comp"),
                    F.col("comp").alias("__old"),
                )
            hop = stepped.select(
                F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
            )
            compressed = stepped.join(
                hop, stepped["comp"] == hop["h_node"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias(
                    "comp"
                ),
                "__old",
            )
            compressed = compressed.localCheckpoint(eager=False)
            changed = compressed.filter(
                F.col("comp") != F.col("__old")
            ).count()
            labels = compressed.select("node", "comp")
            rounds.append(
                {"round": r, "sec": round(time.perf_counter() - t0, 3),
                 "changed": changed}
            )
            if changed == 0:
                break
        spark.conf.set("spark.sql.shuffle.partitions", session_sp)
        print(json.dumps({"parts": parts, "rounds": rounds}))
    elif args.mode == "ab":
        names = args.variants
        keep = _persistent_ids(spark)
        sums = {}
        for n in names:
            sums[n] = checksum(spark, pairs, n)
            _cleanup(spark, keep)
        base = sums[names[0]]
        for n in names[1:]:
            assert sums[n] == base, f"variant {n} labels differ: {sums}"
        times: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(args.reps):
            for n in names:
                dt, _cnt = run_variant(spark, pairs, n)
                times[n].append(round(dt, 3))
                _cleanup(spark, keep)
        out = {
            n: {"min": min(ts), "runs": ts} for n, ts in times.items()
        }
        out["_checksum_equal"] = True
        print(json.dumps(out))
    else:  # explain: build one generic round lazily and dump its plan
        name = args.variants[0]
        session_sp = spark.conf.get("spark.sql.shuffle.partitions")
        n_edges = pairs.count() * 2
        parts = max(1, min(int(session_sp), n_edges // 100_000 + 1))
        edges = _symmetric_edges(pairs, parts)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        # round 1 (materialized), then build round 2 WITHOUT counting it
        fn_round1 = (
            edges.groupBy("src")
            .agg(F.min("dst").alias("__m"))
            .select(
                F.col("src").alias("node"),
                F.least(F.col("src"), F.col("__m")).alias("comp"),
                F.col("src").alias("__old"),
            )
        )
        if name == "copart":
            fn_round1 = fn_round1.repartition(F.col("node"))
        r1 = fn_round1.localCheckpoint(eager=False)
        r1.filter(F.col("comp") != F.col("__old")).count()
        labels = r1.select("node", "comp")
        if name == "delta":
            dsel = r1.filter(F.col("comp") != F.col("__old")).select(
                F.col("node").alias("d_node"), F.col("comp").alias("d_comp")
            )
            nbr_min = (
                edges.join(dsel, edges["dst"] == dsel["d_node"])
                .groupBy("src")
                .agg(F.min("d_comp").alias("nbr_comp"))
            )
        else:
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
        stepped = labels.join(
            nbr_min, labels["node"] == nbr_min["src"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias(
                "comp"
            ),
            F.col("comp").alias("__old"),
        )
        hop = stepped.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        compressed = stepped.join(
            hop, stepped["comp"] == hop["h_node"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce("h_comp", "comp")).alias("comp"),
            "__old",
        )
        if name == "copart":
            compressed = compressed.repartition(F.col("node"))
        txt = spark._jvm.PythonSQLUtils.explainString(
            compressed._jdf.queryExecution(), "formatted"
        )
        spark.conf.set("spark.sql.shuffle.partitions", session_sp)
        if args.out:
            with open(args.out, "w") as f:
                f.write(txt)
            print(args.out)
        else:
            print(txt)
    spark.stop()


if __name__ == "__main__":
    main()
