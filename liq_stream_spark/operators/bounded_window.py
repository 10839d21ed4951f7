"""Hot-key-safe bounded window frames: the two-phase bucketed rewrite of
``Window.partitionBy(hot_key)`` for frames of bounded row extent.

The problem (ARCHITECTURE.md "Hot keys", VERDICT r4/r5): a window
partitioned on a low-cardinality key — ``event_type`` has 5 values —
serializes each key's ENTIRE history into one task. AQE splits skewed
join partitions, not window partitions, so at 100 TB one hot key is one
straggler task however many executors exist. But every frame these
queries use is BOUNDED — ``lead(1)`` (q45), ``ROWS 20 PRECEDING .. 1
PRECEDING`` (q47), ``ROWS K-1 PRECEDING .. CURRENT`` (q50) — which means
a row's frame can reach at most P rows behind it. That bound is what
makes the sessionize_bucketed trick (operators/sessionize.py) apply:

- phase 1: window inside (keys, floor(ts / bucket)) — the hot key
  becomes span/bucket parallel tasks, and every row whose frame lies
  entirely inside its bucket is already final;
- tails: each bucket's LAST row already carries the bucket's P-row
  suffix in its own local frame (plus itself), so the per-bucket tail
  is a FILTER on the phase-1 window output and the tail groupBy
  collects <= P rows per bucket — NEVER a whole-bucket collect_list
  (which would buffer a 100 TB bucket in one agg buffer). The branch
  does plan its own column-pruned scan+shuffle of the narrow
  (keys, ts, tiebreak, value) projection — differently-pruned subtrees
  defeat Catalyst's exchange reuse — so the operator costs two fully
  parallel narrow passes, not one; measured ~1.2x the (scale-broken)
  single-window form at sf0.1. For the LEAD variant the second pass is
  a map-side-combinable min aggregate: its shuffle ships one row per
  (key, bucket, input partition);
- carry: a tiny per-key pass over BUCKET-level rows — span/bucket rows
  of <= P values each, orders of magnitude smaller than the event pass
  — prefixes each bucket with the last P values of everything before
  it;
- phase 2: rows near the top of their bucket (fewer than P local
  predecessors) prepend the missing values from the carry, shipped back
  by a BROADCAST equi-join on (keys, bucket) — keys x span/bucket rows
  of <= P scalars is dashboard-sized at any corpus volume, so the event
  side never reshuffles. (If a deployment's bucket-level frame ever
  outgrew broadcast, dropping the hint leaves a (keys, bucket)
  equi-shuffle — still never one task per key.)

Runtime SPREAD, not just plan shape, is asserted: with one key holding
95% of rows, the window stage's max-task row share stays < 30% while the
single-window form concentrates ~95% in one task — measured via
spark_partition_id() on the operator output, which shares the phase-1
window's physical stage (tests/test_bounded_window.py::
test_hot_key_spreads_across_tasks_at_runtime, VERDICT r6 item 5).

Output equivalence holds for ANY bucket width because the bucket is a
monotone function of the ordering prefix ``ts``: (bucket, ts, tiebreak)
order == (ts, tiebreak) order, rows with equal ts share a bucket, and
the carry is exactly the P-row suffix of the preceding history.
Equivalence to the single-window form is pinned property-style in
tests/test_bounded_window.py (bucket widths down to 1 s force frames
spanning many buckets); the q45/q47/q50 rewrites are additionally
hash-verified against their unchanged DuckDB oracles.

Scale tuning: pick ``bucket_seconds`` so expected rows per (key, bucket)
>> P — the carry then rarely contributes and the bucket-level pass stays
tiny. :func:`derive_bucket_seconds` computes that width FROM THE DATA
(one column-pruned min/max/count aggregate), so consumers never hardcode
a width that stops holding when density grows 1000x (VERDICT r6 item 1:
a hardcoded day bucket at 100 TB/day is one giant task per (key, day)
again). The per-key bucket scan is itself a window partitioned on the
key, but over span/bucket_seconds rows of <= P scalars each — the
derivation caps buckets-per-key so that pass stays small; if even that
serialized pass ever dominated, the same construction nests (bucket the
buckets).

Values ride as structs inside collect_list so NULL entries survive
(collect_list drops bare NULLs but never struct rows) — a ROWS frame
counts physical rows, so a NULL reading must occupy its slot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def derive_bucket_seconds(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    preceding: int,
    *,
    target_multiple: int = 64,
    max_buckets_per_key: int = 4096,
) -> int:
    """Data-density-derived ``bucket_seconds`` for the bucketed window
    operators: the width at which the expected rows per (key, bucket)
    land at ``target_multiple * preceding`` — large enough that the
    carry join touches only ~1/target_multiple of rows (the operator's
    invariant: rows per bucket >> P), small enough that a hot key's
    history is never one window task however dense the data gets.

    One column-pruned aggregate over (keys, ts): COUNT, approximate key
    cardinality, and the ts span. The width SHRINKS as density grows —
    rows per (key, bucket) stay ~constant at any corpus volume, so the
    phase-1 parallelism per key rises with the data instead of being
    frozen by a hardcoded constant (VERDICT r6 item 1). Guard rails:

    - buckets per key are capped at ``max_buckets_per_key`` — the carry
      pass is a per-key serialized window over bucket rows and the
      carry frame ships back by broadcast (keys x buckets x <= P
      scalars), so sparse-but-long spans must not explode into millions
      of near-empty buckets;
    - the result is clamped to >= 1 s (the operators' resolution) and,
      for empty/degenerate frames (0 rows or a single distinct ts),
      falls back to a fixed 24 h (the span is 0/undefined there; ANY
      width is correct when there is nothing to parallelize).

    The derivation costs one extra narrow scan; callers that know their
    density (or reuse a width across queries over the same frame) can
    skip it and pass an explicit ``bucket_seconds``. Correctness never
    depends on the choice — output equivalence holds for ANY width (see
    module doc); this picks the width that makes the plan scale.
    """
    if preceding < 1:
        raise ValueError("preceding must be >= 1")
    if target_multiple < 2:
        raise ValueError("target_multiple must be >= 2")
    keys = [keys] if isinstance(keys, str) else list(keys)
    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.struct(*keys)).alias("k"),
        F.min(F.unix_micros(F.col(ts_col))).alias("lo"),
        F.max(F.unix_micros(F.col(ts_col))).alias("hi"),
    ).first()
    n, k, lo, hi = stats["n"], stats["k"], stats["lo"], stats["hi"]
    if not n or lo is None or hi is None or hi <= lo:
        return 24 * 3600  # nothing to parallelize; any width is correct
    span_s = (hi - lo) / 1e6
    rows_per_key = n / max(k, 1)
    target_rows = max(
        float(target_multiple * preceding),
        rows_per_key / max_buckets_per_key,
    )
    buckets_per_key = max(rows_per_key / target_rows, 1.0)
    return max(int(span_s / buckets_per_key) or 1, 1)


def _last_n(arr: Column, n: int) -> Column:
    """The <= n-element suffix of ``arr`` (empty-safe: slice(x, 1, 0) is
    [])."""
    size = F.size(arr)
    take = F.least(F.lit(n), size)
    start = F.greatest(size - take + F.lit(1), F.lit(1))
    return F.slice(arr, start, take)


def _with_bucket(df: DataFrame, ts_col: str, bucket_seconds: int) -> DataFrame:
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    bucket_us = bucket_seconds * 1_000_000
    return df.withColumn(
        "__b", F.floor(F.unix_micros(F.col(ts_col)) / bucket_us)
    )


def _pin_window_partitioning(ev: DataFrame, keys: list[str]) -> DataFrame:
    """Make the phase-1 window's exchange EXPLICIT at the session's
    configured shuffle-partition count (r13).

    AQE's partition coalescing sizes post-shuffle partitions for
    shuffle-READ efficiency (>= minPartitionSize, default 1 MB), which
    assumes per-byte downstream cost. The phase-1 frame windows here
    are COMPUTE-bound — exact-decimal rolling moments / O(P) frame
    folds per row — so a small-but-dense input (2 MB of events at
    fixture scale) gets coalesced to one or two tasks and the whole
    window serializes: measured 1.50 -> 0.98 s (q47) and 1.30 ->
    0.57 s (q50) warm at sf0.1 when the stage runs at the session's
    partition count instead. A user repartition on the window's own
    partition keys is exactly the same hash exchange the window plans
    implicitly (no second shuffle — ClusteredDistribution is
    satisfied), just exempt from size-based coalescing. At scale the
    exchange's partition count equals what the session config already
    tuned, so nothing changes there."""
    n = int(ev.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return ev.repartition(n, *[F.col(k) for k in keys], F.col("__b"))


def _join_back(ev: DataFrame, bt: DataFrame, keys: list[str]) -> DataFrame:
    """Broadcast the bucket-level frame back onto events on
    (keys, bucket), null-safe on the keys (Window.partitionBy groups
    NULL keys together, so the rewrite must too)."""
    bt = bt.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        F.col("__b").alias("__bb"),
        *[c for c in bt.columns if c not in keys and c != "__b"],
    )
    cond = F.col("__b") == F.col("__bb")
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__bk_{k}"))
    out = ev.join(F.broadcast(bt), cond, "inner")
    return out.drop("__bb", *[f"__bk_{k}" for k in keys])


def trailing_values_bucketed(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    preceding: int,
    bucket_seconds: int,
    include_current: bool = False,
    out_col: str = "__frame",
) -> DataFrame:
    """Adds ``out_col``: the array of ``value_col`` over the bounded
    trailing ROWS frame [-preceding, include_current ? 0 : -1] of the
    window ``partitionBy(keys).orderBy(ts_col, tiebreak_col)`` — computed
    with per-(key, bucket) parallelism instead of one task per key.

    Array order is frame order (oldest first) and NULL values keep their
    slots, so ``aggregate``/``zip_with`` over it reproduce any
    ROWS-frame aggregate exactly: sums/counts because they are
    order-free, position-weighted folds (EWMA) because the order is the
    frame's. The ordering (ts_col, tiebreak_col) must be a total order
    per key (unique tiebreak) and ts_col non-NULL.
    """
    if preceding < 1:
        raise ValueError("preceding must be >= 1")
    keys = [keys] if isinstance(keys, str) else list(keys)
    P = preceding
    ev = _pin_window_partitioning(
        _with_bucket(df, ts_col, bucket_seconds), keys
    )

    wl = W.partitionBy(*keys, "__b").orderBy(ts_col, tiebreak_col)
    local = F.transform(
        F.collect_list(F.struct(F.col(value_col).alias("v"))).over(
            wl.rowsBetween(-P, 0 if include_current else -1)
        ),
        lambda s: s["v"],
    )
    ev = (
        ev.withColumn("__r", F.row_number().over(wl))
        .withColumn(
            "__cnt",
            F.count(F.lit(1)).over(
                wl.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            ),
        )
        .withColumn("__local", local)
    )

    # bucket tails from phase 1 itself: the LAST row of a bucket already
    # holds the bucket's P-row suffix in its local frame (append its own
    # value for exclude-current frames) — a filter, not a second scan
    if include_current:
        tail = _last_n(F.col("__local"), P)
    else:
        tail = _last_n(
            F.concat(F.col("__local"), F.array(F.col(value_col))), P
        )
    bt = ev.filter(F.col("__r") == F.col("__cnt")).select(
        *keys, "__b", tail.alias("__tail")
    )
    # per-key scan over BUCKET rows (tiny): carry = last P values of all
    # preceding buckets' tails, in global frame order. The frame needs
    # only the PREVIOUS P buckets: every non-empty bucket's tail holds
    # >= 1 value, so P buckets always cover the last P values — an
    # unbounded-preceding flatten would make this pass quadratic in
    # bucket count per key
    wb = W.partitionBy(*keys).orderBy("__b").rowsBetween(-P, -1)
    bt = bt.withColumn(
        "__carry", _last_n(F.flatten(F.collect_list("__tail").over(wb)), P)
    ).drop("__tail")

    joined = _join_back(ev, bt, keys)
    # rows deeper than P into their bucket never need the carry; a row at
    # in-bucket position r is missing need = P - (r-1) predecessors, and
    # takes the <= need-element suffix the carry actually has
    need = F.lit(P) - (F.col("__r") - F.lit(1))
    take = F.least(need, F.size("__carry"))
    carried = F.slice(
        F.col("__carry"),
        F.greatest(F.size("__carry") - take + F.lit(1), F.lit(1)),
        take,
    )
    frame = F.when(F.col("__r") > P, F.col("__local")).otherwise(
        F.concat(carried, F.col("__local"))
    )
    return joined.withColumn(out_col, frame).drop(
        "__b", "__r", "__cnt", "__local", "__carry"
    )


def trailing_decimal_moments_bucketed(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    preceding: int,
    bucket_seconds: int,
) -> DataFrame:
    """Adds ``__s``/``__ssq`` (double) and ``__n`` (int): the exact-
    decimal sum, sum of squares, and non-NULL count of ``value_col``
    over the trailing ROWS frame [-preceding, -1] of
    ``partitionBy(keys).orderBy(ts_col, tiebreak_col)`` — the rolling-
    moments specialization of :func:`trailing_values_bucketed`.

    Why a specialization: sums don't need the frame ARRAY, so phase 1
    can use Spark's INCREMENTAL window sums (O(1)/row, no per-row O(P)
    struct copies) over (keys, bucket); only the <= P first rows of each
    bucket fold the broadcast carry values in-row, under a lazily-
    evaluated guard — measured 2x faster than the array form at sf0.1
    with the identical result. Single event scan/shuffle: the tail
    branch filters the last P rows per bucket off the SAME windowed
    frame (the window's input exchange is reused; the tiny per-bucket
    groupBy shuffles <= P rows per bucket).

    Exactness: every accumulation is DECIMAL — values at (18,6), window
    sums at their NATURAL precisions ((28,6) for sums, (38,12) for sums
    of (37,12) squares — same as the single-window form), and each
    addition's natural result precision stays <= 38 so Spark never
    applies its precision-cap scale reduction (a (38,12)+(38,12)
    scale-12 add would silently round to scale 11!). ``__s``/``__ssq``
    are therefore the exact rational frame sums, rounded ONCE to double
    — bit-identical to a plain decimal window sum and to the DuckDB
    oracle. NULL semantics match window sums: NULL when the frame holds
    no non-NULL value; NULLs occupy frame slots but join no sum.

    Value-range bounds (ADVICE r6 — the exact-decimal price): rows that
    never touch the carry (all but the <= P first rows of each bucket)
    carry the single-window form's own bounds — sum |values| < 1e22,
    sum of squares < 1e26 (|value| < ~1e13/sqrt(P)). Carry-folding rows
    are 10x narrower on the squares: the (38,12)+(37,12) add ceiling
    forces the windowed square-sum through (37,12), so they overflow to
    NULL at square-sums >= 1e25 (|value| >= ~3e12/sqrt(P)); sums match
    the 1e22 bound everywhere. A carry-band overflow yields NULL
    moments for the affected row under EITHER ANSI setting, never a
    silently-wrong value and never a job abort: the narrowing casts are
    try_cast (r7 — a plain cast throws under ANSI, Spark 4's default,
    and an earlier coalesce substituted 0 for the overflow-NULL under
    ANSI-off) and the empty-frame zero substitution is gated on the
    frame count so it cannot swallow an overflow-NULL. Beyond the
    NATURAL (28,6)/(38,12) window-sum range, behavior is the engine's
    own (ANSI error / NULL), identical to the single-window form this
    replaces. Pins: exactness at 5e11-scale values incl. carry rows,
    and NULL (not zero) in the carry overflow band —
    tests/test_bounded_window.py."""
    if preceding < 1:
        raise ValueError("preceding must be >= 1")
    keys = [keys] if isinstance(keys, str) else list(keys)
    P = preceding
    ev = _pin_window_partitioning(
        _with_bucket(df, ts_col, bucket_seconds), keys
    )
    wl = W.partitionBy(*keys, "__b").orderBy(ts_col, tiebreak_col)
    fr = wl.rowsBetween(-P, -1)
    dec = F.col(value_col).cast("decimal(18,6)")
    ev = (
        ev.withColumn("__r", F.row_number().over(wl))
        .withColumn(
            "__cnt",
            F.count(F.lit(1)).over(
                wl.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            ),
        )
        # natural sum precisions — (28,6) and (38,12); any down-cast
        # here would narrow the overflow-free range for EVERY row
        # (ADVICE r6), so only the carry branch narrows, lazily
        .withColumn("__sl", F.sum(dec).over(fr))
        .withColumn("__ql", F.sum(dec * dec).over(fr))
        .withColumn("__nl", F.count(value_col).over(fr))
    )

    # bucket tails off the windowed frame: the last P rows per bucket,
    # by filter — the groupBy then shuffles <= P rows per bucket
    tail_arr = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(tiebreak_col).alias("o"),
                    F.col(value_col).alias("v"),
                )
            )
        ),
        lambda s: s["v"],
    )
    bt = (
        ev.filter(F.col("__r") > F.col("__cnt") - P)
        .groupBy(*keys, "__b")
        .agg(tail_arr.alias("__tail"))
    )
    # previous-P-buckets frame: non-empty tails hold >= 1 value each, so
    # P buckets always cover the last P values (see the values variant)
    wb = W.partitionBy(*keys).orderBy("__b").rowsBetween(-P, -1)
    bt = bt.withColumn(
        "__carry", _last_n(F.flatten(F.collect_list("__tail").over(wb)), P)
    ).drop("__tail")

    joined = _join_back(ev, bt, keys)
    need = F.lit(P) - (F.col("__r") - F.lit(1))
    take = F.least(need, F.size("__carry"))
    carried = F.slice(
        F.col("__carry"),
        F.greatest(F.size("__carry") - take + F.lit(1), F.lit(1)),
        take,
    )
    cnn = F.filter(carried, lambda x: x.isNotNull())
    # carry folds at the widest scale-preserving precisions: each fold
    # add's NATURAL precision is exactly 38 ((28,6)+(18,6) -> 29;
    # (37,12)+(37,12) -> 38), so no add ever triggers Spark's silent
    # scale reduction, and the re-cast overflows (to NULL) only at
    # 1e22 / 1e25 — see the docstring's range bounds
    # try_cast, not cast: the fold's re-casts are where the documented
    # carry ceilings live (1e22 / 1e25), and NULL-on-overflow must hold
    # under BOTH ANSI settings — a plain cast aborts the whole job under
    # ANSI (Spark 4's default) and silently zeroes through the old
    # coalesce under ANSI-off (r7 review). A NULL mid-fold propagates to
    # the row's output moment, which is the contract.
    s_carry = F.aggregate(
        cnn,
        F.lit(0).cast("decimal(28,6)"),
        lambda a, x: (a + x.cast("decimal(18,6)")).try_cast("decimal(28,6)"),
    )
    q_carry = F.aggregate(
        cnn,
        F.lit(0).cast("decimal(37,12)"),
        lambda a, x: (
            a + x.cast("decimal(18,6)") * x.cast("decimal(18,6)")
        ).try_cast("decimal(37,12)"),
    )
    zero_s = F.lit(0).cast("decimal(28,6)")
    zero_q = F.lit(0).cast("decimal(37,12)")
    use_carry = F.col("__r") <= P
    n = F.when(use_carry, F.col("__nl") + F.size(cnn)).otherwise(
        F.col("__nl")
    )
    # (28,6)+(28,6) -> (29,6) exact; the squares add needs __ql through
    # (37,12) (a (38,12)+(37,12) add would reduce scale) — the ONLY
    # narrowing, and it applies lazily to carry rows alone.
    # The empty-frame substitution is gated on __nl == 0, NOT a
    # coalesce: a local sum that overflowed its precision (__sl at 1e22,
    # __ql's (37,12) re-cast at 1e25) is ALSO NULL, and a coalesce would
    # silently replace it with 0 — the exact silently-wrong-value
    # failure the NULL-on-overflow contract forbids (r7 review). With
    # the gate, overflow-NULL propagates through the carry add to the
    # output as documented.
    s_base = F.when(F.col("__nl") == 0, zero_s).otherwise(F.col("__sl"))
    q_base = F.when(F.col("__nl") == 0, zero_q).otherwise(
        F.col("__ql").try_cast("decimal(37,12)")
    )
    s_exact = F.when(use_carry, s_base + s_carry).otherwise(F.col("__sl"))
    q_exact = F.when(use_carry, q_base + q_carry).otherwise(F.col("__ql"))
    return (
        joined.withColumn(
            "__s", F.when(n > 0, s_exact.cast("double"))
        )
        .withColumn("__ssq", F.when(n > 0, q_exact.cast("double")))
        .withColumn("__n", n)
        .drop("__b", "__r", "__cnt", "__sl", "__ql", "__nl", "__carry")
    )


def lead_ts_bucketed(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    tiebreak_col: str,
    bucket_seconds: int,
    out_col: str = "__lead_ts",
) -> DataFrame:
    """Adds ``out_col`` = ``lead(ts_col, 1)`` over
    ``partitionBy(keys).orderBy(ts_col, tiebreak_col)``, bucketed: the
    in-bucket lead covers every row but each bucket's last, which takes
    the FIRST timestamp of the key's next non-empty bucket from a
    bucket-level lead (span/bucket rows per key, broadcast back).
    ts_col must be non-NULL (it is the ordering prefix).

    The head branch is a plain min aggregate — map-side COMBINABLE, so
    its shuffle ships one row per (key, bucket, input partition) however
    large the buckets grow (cheaper than filtering the windowed frame,
    which would re-shuffle every event row)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    ev = _with_bucket(df, ts_col, bucket_seconds)
    wl = W.partitionBy(*keys, "__b").orderBy(ts_col, tiebreak_col)
    ev = ev.withColumn("__local_lead", F.lead(ts_col).over(wl))

    # bucket heads: min over the (ts, tiebreak) total order per bucket
    head = F.min(
        F.struct(F.col(ts_col).alias("t"), F.col(tiebreak_col).alias("o"))
    )["t"]
    bt = (
        _with_bucket(df, ts_col, bucket_seconds)
        .groupBy(*keys, "__b")
        .agg(head.alias("__head"))
    )
    wb = W.partitionBy(*keys).orderBy("__b")
    bt = bt.withColumn("__next_head", F.lead("__head").over(wb)).drop(
        "__head"
    )
    joined = _join_back(ev, bt, keys)
    return joined.withColumn(
        out_col, F.coalesce("__local_lead", "__next_head")
    ).drop("__b", "__local_lead", "__next_head")
