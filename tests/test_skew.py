"""salted_join (operators/skew.py): the skew-salting rewrite must be
result-IDENTICAL to the plain equi-join — including duplicate keys on
both sides (multiplicity), NULL join keys, and left-outer null padding —
because that invariance is what lets q51 register the unsalted SQL as
its oracle."""

import pytest
from pyspark.sql import functions as F

from liq_stream_spark.operators.skew import salted_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            # hot key 'a' x4, dup right rows for 'b', null key, unmatched 'z'
            (1, "a", 10.0), (2, "a", 11.0), (3, "a", 12.0), (4, "a", 13.0),
            (5, "b", 20.0), (6, "b", 21.0), (7, None, 30.0), (8, "z", 40.0),
        ],
        "id long, k string, v double",
    )
    right = spark.createDataFrame(
        [("a", 100), ("b", 200), ("b", 201), (None, 300), ("y", 400)],
        "k string, w int",
    )
    return left, right


def _sorted_rows(df):
    # None-safe order: compare on the repr'd tuple, return the values
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("n_salts", [1, 3, 8])
def test_parity_with_plain_join(spark, how, n_salts):
    left, right = _frames(spark)
    got = salted_join(left, right, "k", n_salts=n_salts, how=how)
    want = left.join(right, "k", how)
    assert got.columns == want.columns
    assert _sorted_rows(got) == _sorted_rows(want)


def test_parity_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", 1, 5.0), (2, "a", 1, 6.0), (3, "a", 2, 7.0)],
        "id long, k1 string, k2 int, v double",
    )
    right = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 2, 21)], "k1 string, k2 int, w int"
    )
    got = salted_join(left, right, ["k1", "k2"], n_salts=4)
    want = left.join(right, ["k1", "k2"])
    assert _sorted_rows(got) == _sorted_rows(want)


def test_salt_cols_subset_and_determinism(spark):
    left, right = _frames(spark)
    a = salted_join(left, right, "k", n_salts=5, salt_cols=["id"])
    b = salted_join(left, right, "k", n_salts=5, salt_cols=["id"])
    assert _sorted_rows(a) == _sorted_rows(b)  # deterministic rerun
    assert _sorted_rows(a) == _sorted_rows(left.join(right, "k"))


def test_salt_actually_spreads(spark):
    """With a single hot key, the OPERATOR'S salt derivation (salt_expr,
    the exact expression salted_join assigns) must place the key's rows
    on >1 salt value — otherwise the rewrite silently degenerates to the
    plain join's one-task-per-key behavior. Uses the exported expression,
    not a copy, so a regression in the derivation (e.g. hashing only the
    join key) fails here even though every parity test would still pass."""
    from liq_stream_spark.operators.skew import salt_expr

    left = spark.range(200).select(
        F.col("id"), F.lit("hot").alias("k")
    )
    n_distinct = (
        left.select(salt_expr(["id"], 8).alias("__s"))
        .distinct()
        .count()
    )
    assert n_distinct > 4  # 200 xxhash64 draws over 8 buckets
    # hashing a constant column must NOT spread — guards the scenario
    # where salt_cols defaults to just the (hot) join key
    assert (
        left.select(salt_expr(["k"], 8).alias("__s")).distinct().count() == 1
    )


def test_invalid_args(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, "k", n_salts=0)
    with pytest.raises(ValueError, match="only inner/left"):
        salted_join(left, right, "k", how="right")
    with pytest.raises(ValueError, match="must exist"):
        salted_join(left, right, "nope")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(left.withColumn("__salt", F.lit(1)), right, "k")
    with pytest.raises(ValueError, match="at least one column"):
        salted_join(left, right, "k", salt_cols=[])
    with pytest.raises(ValueError, match="left side"):
        salted_join(left, right, "k", salt_cols=["typo"])


def test_degenerate_salt_cols_rejected(spark):
    """salt_cols ⊆ join keys makes the salt constant per key — the join
    would still be correct but the hot key stays in one partition, which
    is the exact failure the operator exists to prevent; it must refuse
    loudly rather than silently degenerate (ADVICE r5). Also fires via
    the default salt_cols=all-columns when the left frame carries only
    the key columns."""
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="constant per key"):
        salted_join(left, right, "k", salt_cols=["k"])
    with pytest.raises(ValueError, match="constant per key"):
        salted_join(left.select("k"), right, "k")


def test_spread_for_compute_guard_and_memo(spark):
    """The compute-parallelism guard: a 1-split frame spreads to the
    session's cores, an already-wide frame passes through unchanged, and
    a caller-supplied ``splits`` skips the RDD probe entirely. The probe
    is memoized per semanticHash (ADVICE r7: embedded callers paid a
    plan-to-RDD conversion on every build), so a second call with a
    semantically-equal frame must not probe again."""
    from unittest import mock

    from liq_stream_spark.operators import skew
    from liq_stream_spark.operators.skew import spread_for_compute

    target = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(64)], "x long")
    narrow = narrow.coalesce(1)

    skew._SPLITS_MEMO.clear()
    spread = spread_for_compute(narrow)
    assert spread.rdd.getNumPartitions() == target
    # wide enough already -> identity (no repartition inserted)
    wide = narrow.repartition(target)
    assert spread_for_compute(wide) is wide

    with mock.patch.object(
        type(narrow), "rdd", new_callable=mock.PropertyMock
    ) as probe:
        # same frame object: its semanticHash is already memoized
        out = spread_for_compute(narrow)
        probe.assert_not_called()
        # caller-supplied splits: no probe even for an unseen frame
        skew._SPLITS_MEMO.clear()
        out2 = spread_for_compute(narrow, splits=1)
        probe.assert_not_called()
    # partition counts checked outside the patch (out.rdd is real again)
    assert out.rdd.getNumPartitions() == target
    assert out2.rdd.getNumPartitions() == target


def test_lsh_chunk_validated_on_every_path(spark):
    """chunk < 1 must raise on BOTH the capped and uncapped paths — the
    r7 layout validated after the capped early return, so
    (max_bucket=1000, chunk=0) was silently accepted (ADVICE r7)."""
    from liq_stream_spark.operators.dedup import (
        lsh_candidate_pairs_banded,
        minhash_sig_arrays,
    )

    docs = spark.createDataFrame(
        [(1, "some text here"), (2, "other text there")],
        "doc_id long, text string",
    )
    wide = minhash_sig_arrays(docs)
    for max_bucket in (1000, None):
        with pytest.raises(ValueError, match="chunk"):
            lsh_candidate_pairs_banded(wide, max_bucket=max_bucket, chunk=0)


def test_broadcast_row_budget_parses_threshold_forms(spark):
    """r14: the CC/PageRank loops gate their broadcast hints and edge
    pin style on this budget — it must honor the session knob in every
    spelling, and -1 (broadcast disabled) must shut the gate."""
    from liq_stream_spark.operators.skew import broadcast_row_budget

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want_bytes in (
            ("10485760", 10 * 1024 * 1024),
            ("10485760b", 10 * 1024 * 1024),
            ("64MB", 64 * 1024 * 1024),
            ("1g", 1 << 30),
            ("-1", 0),
        ):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert broadcast_row_budget(spark) == want_bytes // 64, raw
        assert broadcast_row_budget(spark, bytes_per_row=128) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
