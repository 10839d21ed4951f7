#!/usr/bin/env python
"""Round-14 t13 lab (VERDICT r13 item 5): the r13 bigram-LM level
derivation (ONE corpus-sized groupBy; model/starts derived from it) was
fixture-flat at sf0.1 (corpus too small for the pass count to matter).
Reproduce the A/B at a corpus that exercises it (the 100x documents
tier from tools_r14/make_scale10.py): r12 shape = THREE groupBys over
the exploded corpus-sized bigram frame.

Usage: python tools_r14/t13_lab.py [--reps 3] [--sf-dir /root/scale100d]
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

from liq_stream_spark.functions.core import qfloor_long, qround  # noqa: E402
from liq_stream_spark.operators.text import bigram_lm_scores, tokens  # noqa: E402
from liq_stream_spark.plans.tables import load  # noqa: E402
from liq_stream_spark.session import get_spark  # noqa: E402


def bigram_lm_scores_r12(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The pre-r13 shape: model, starts AND occ each aggregate the
    exploded corpus-sized bigram frame (three corpus passes)."""
    t = tokens(text_col)
    pairs = F.expr(
        "CASE WHEN size(trim_toks) < 2 "
        "THEN CAST(array() AS array<struct<w1:string,w2:string>>) "
        "ELSE transform(sequence(1, size(trim_toks) - 1), "
        "i -> struct(element_at(trim_toks, i) AS w1, "
        "element_at(trim_toks, i + 1) AS w2)) END"
    )
    tb = (
        docs.select(F.col(id_col), t.alias("trim_toks"))
        .select(F.col(id_col), F.explode(pairs).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    occ = tb.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    model = (
        tb.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
        .localCheckpoint(eager=False)
    )
    starts = tb.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        occ.join(model, ["w1", "w2"], "left")
        .join(starts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("k"),
            qfloor_long(
                F.log(F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1))
                - F.log(F.coalesce(F.col("cu"), F.lit(0)) + F.col("v")),
                6,
            ).alias("logp_micro"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("logp_micro") * F.col("k")).alias("ll_micro"),
        )
    )
    out = docs.select(id_col).join(scored, id_col, "left")
    avg_nll = -F.col("ll_micro") / (F.col("n_bigrams") * F.lit(1e6))
    return out.select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        avg_nll.alias("avg_nll"),
        qround(F.exp(avg_nll), 6).alias("ppl"),
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/scale100d")
    args = ap.parse_args()
    spark = get_spark(
        app_name="liq_r14_t13_lab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = load(spark, args.sf_dir, "documents")
    keep = _persistent_ids(spark)

    def cks(df):
        return list(
            df.agg(
                F.count(F.lit(1)),
                F.sum("n_bigrams"),
                F.sum(
                    F.xxhash64(
                        "doc_id", "n_bigrams", F.col("ppl").cast("decimal(28,12)")
                    ).cast("decimal(38,0)")
                ),
            ).collect()[0]
        )

    c_new = cks(bigram_lm_scores(docs))
    _cleanup(spark, keep)
    c_old = cks(bigram_lm_scores_r12(docs))
    _cleanup(spark, keep)
    assert c_new == c_old, f"results differ: {c_old} vs {c_new}"

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn(docs).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    times = {"r12_three_groupbys": [], "r13_hierarchy": []}
    for _ in range(args.reps):
        times["r12_three_groupbys"].append(round(timed(bigram_lm_scores_r12), 3))
        _cleanup(spark, keep)
        times["r13_hierarchy"].append(round(timed(bigram_lm_scores), 3))
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
