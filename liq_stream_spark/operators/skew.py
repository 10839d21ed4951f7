"""Skew-salted equi-join — the standard remedy when a shuffle join's key
distribution is dominated by a few hot values and one task ends up with
an entire key's rows.

``salted_join(left, right, on, n_salts)`` rewrites ``left ⋈ right ON k``
as ``left ⋈ right' ON (k, salt)`` where every left row gets ONE
deterministic salt in ``[0, n_salts)`` and every right row is replicated
once per salt value. A hot key's left rows therefore hash-partition into
``n_salts`` different shuffle partitions instead of one, restoring
parallelism inside the key, at the cost of shipping the right side
``n_salts`` times. The result set is IDENTICAL to the plain join (each
matching (l, r) pair meets exactly once — l carries one salt and r
exists at every salt), which is what makes the operator oracle-exact and
safe to drop into any plan.

When to reach for it at scale:
- both sides too large to broadcast AND the key histogram has heavy
  hitters (few event types / symbols / languages over billions of rows);
- AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`) already
  splits oversized PARTITIONS, but a single key's rows still meet one
  matching-side partition per split — salting additionally spreads the
  key itself. That distinction holds in batch AND in Structured
  Streaming micro-batches (where, empirically on Spark 4, AQE DOES run
  — the earlier claim that it doesn't was wrong: micro-batch plans show
  AdaptiveSparkPlan with AQEShuffleRead, and its partition COALESCING
  will even merge small shuffle partitions back together). Proven live:
  streaming/joins.enrich_stream routes through this operator, and
  tests/test_streaming_joins.py::
  test_salted_enrichment_spreads_hot_key_in_microbatch asserts a hot
  key's rows land on multiple tasks WITHIN one micro-batch.

The salt must be deterministic (task retries must re-derive the same
value — `rand()` would break exactly-once sinks), so it is
xxhash64-derived from the left row's columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salt_expr(cols: list[str], n_salts: int):
    """The deterministic salt column salted_join assigns to left rows:
    xxhash64 over ``cols``, folded into [0, n_salts). Exposed so tests
    (and callers pre-partitioning by the same salt) use the operator's
    actual derivation rather than a copy that can drift."""
    if not cols:
        raise ValueError("salt_cols must name at least one column")
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's
    hot keys spread over ``n_salts`` shuffle partitions.

    ``how`` may be ``inner`` or ``left`` (the modes where one-salt-per-
    left-row keeps row multiplicity identical to the plain join; right/
    full outer would need the mirrored construction). ``salt_cols``
    picks the left columns the salt is derived from (default: all) —
    pass a unique-id column when the row is wide.

    Output columns follow Spark's join rule (join keys once, then the
    non-key columns of both sides); the salt column is dropped.
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left preserve "
                         "multiplicity under one-salt-per-left-row")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")
    if _SALT in left.columns or _SALT in right.columns:
        raise ValueError(f"{_SALT} column already present")
    src = salt_cols if salt_cols is not None else left.columns
    if not src:
        raise ValueError("salt_cols must name at least one column")
    bad = [c for c in src if c not in left.columns]
    if bad:
        raise ValueError(f"salt_cols {bad} must exist on the left side")
    if set(src) <= set(keys):
        # a salt derived only from the join key is CONSTANT within each
        # key, so every hot-key row still lands in one shuffle partition
        # — the join stays correct but the operator silently degenerates
        # to the plain join's one-task-per-key behavior (ADVICE r5).
        # Happens by default when the left frame carries nothing but the
        # key columns; pass a row-distinguishing column explicitly.
        raise ValueError(
            f"salt_cols {list(src)} are a subset of the join keys {keys}: "
            "the salt would be constant per key and spread nothing — "
            "include a column that varies within a key (e.g. a row id)"
        )
    salted_left = left.withColumn(_SALT, salt_expr(src, n_salts))
    replicated_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(replicated_right, keys + [_SALT], how)
    return out.drop(_SALT)


_SPLITS_MEMO: dict[int, int] = {}


def spread_for_compute(
    df: DataFrame,
    min_tasks: int | None = None,
    splits: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Round-robin ``df`` across the session's cores IFF its physical
    partitioning is narrower than half of them — the compute-parallelism
    guard for expensive per-row projections (Pandas-UDF signature /
    scoring passes) whose input arrives in too few splits.

    Why it exists: Spark parallelizes a scan stage by input splits, and a
    parquet ROW GROUP is the unit a split can't subdivide — a
    single-row-group file (or a gzipped dump, or a small-but-hot dim
    about to fan into heavy compute) runs its whole scan stage, UDFs
    included, on ONE task no matter how many cores the cluster has. At
    100 TB inputs arrive as thousands of row groups and this helper is a
    NO-OP (the guard sees parallelism >= cores and returns ``df``
    unchanged — nothing moves, the scan-splits-are-the-parallelism story
    holds). It only pays the one narrow shuffle when upstream physically
    cannot feed the cores, where shuffle bytes << the compute it
    unlocks.

    Caveat: the guard probes ``df.rdd.getNumPartitions()``, so call it
    at SCAN boundaries (a freshly loaded frame) — on an AQE
    shuffle-derived frame building the RDD can execute upstream stages.
    The probe is a plan-to-RDD conversion (full physical planning), so
    it is MEMOIZED per ``df.semanticHash()`` for the process lifetime
    (ADVICE r7: embedded callers like simhash_table paid it on every
    build): semantically-equal plans have equal physical partitioning,
    and a hash collision can only skip/add a semantically-neutral
    repartition, never change results. Callers that already know their
    split count can pass ``splits`` and skip the probe entirely.

    ``key_cols`` (r13): spread by HASH of the named high-cardinality
    columns instead of round-robin. A keyless ``repartition(n)`` first
    locally sorts its input so retried tasks reproduce the same
    row-to-partition assignment (spark.sql.execution.sortBeforeRepartition,
    SPARK-23207) — negligible for the few-thousand-doc UDF frames this
    guard was built for, but a measurable serial tax when the spread
    side is a fact table (600k-row lineitem: hash 0.78 s vs round-robin
    1.29 s end-to-end on the q01 shape). Hash partitioning needs no
    sort (it is already deterministic per row) and a near-unique key
    spreads as evenly. Pass the table's primary key."""
    sc = df.sparkSession.sparkContext
    target = min_tasks or sc.defaultParallelism
    if splits is None:
        key = df.semanticHash()
        splits = _SPLITS_MEMO.get(key)
        if splits is None:
            splits = df.rdd.getNumPartitions()
            _SPLITS_MEMO[key] = splits
    if splits * 2 > target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def broadcast_row_budget(spark, bytes_per_row: int = 64) -> int:
    """Max rows a caller may BROADCAST-hint for a frame whose plan is a
    stats-less pin (``localCheckpoint``/``persist`` LogicalRDDs default
    to ``defaultSizeInBytes``, so Catalyst never auto-broadcasts them)
    when the caller knows the EXACT row count (guide §3.1).

    The budget is the session's own ``autoBroadcastJoinThreshold``
    divided by a conservative per-row estimate — i.e. the caller makes
    exactly the decision Catalyst would make if the relation carried
    statistics, against the same knob. Scale-adaptive by construction:
    a corpus-sized frame at 100 TB is orders of magnitude past any
    sane threshold, so the gate stays shut and the caller's sort-merge
    plan is untouched; setting the threshold to ``-1`` (broadcast
    disabled) yields a budget of 0."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        nbytes = int(raw) * mult
    except ValueError:
        nbytes = 10 * 1024 * 1024
    return max(0, nbytes) // max(1, bytes_per_row)
