"""Count-bounded LRU dedup ring — exact parity with the reference's
50,000-key set+deque ring (`hyperliquid_adapter.py:149-164`: `_seen_key`
membership set, `_check_seen` append + evict-oldest), as a custom stateful
streaming operator on `applyInPandasWithState`.

The engine's default HL dedup is time-bounded (`hl_dedup_within_watermark`
— a documented semantic upgrade). This operator exists for deployments
that need the reference's exact COUNT-bounded behavior: a key is dropped
while it sits among the most recent ``ring_size`` distinct keys and is
re-admitted after eviction, regardless of elapsed time.

Distribution: a single global arrival-ordered ring is inherently
sequential, so the operator shards it — rows group by
``hash(key) % n_groups`` and each group keeps an independent LRU of
``ring_size // n_groups`` keys. ``n_groups=1`` IS the reference semantics
bit-for-bit (one sequential ring — fine at the reference's single-node
scale); larger ``n_groups`` is the standard sharded-LRU approximation that
scales state and throughput linearly across executors (each shard holds
the most recent keys OF ITS SHARD, which matches the global ring whenever
key hashing spreads arrivals evenly). State lives in the state store
(RocksDB on a cluster) as one array of keys per shard."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def ring_dedup(
    df: DataFrame,
    key_col: str,
    ring_size: int = 50_000,
    n_groups: int = 1,
    order_col: str = "ts_ingest_ms",
) -> DataFrame:
    """Drop rows whose ``key_col`` is present in the (sharded) LRU ring;
    admit and remember the rest. Output columns = input columns (the key
    column is retained; drop it downstream if it was synthetic).

    ``order_col`` fixes the within-micro-batch processing order (arrival
    order in the reference); ties keep input order (stable sort)."""
    if ring_size < 1 or n_groups < 1:
        raise ValueError("ring_size and n_groups must be >= 1")
    if key_col not in df.columns or order_col not in df.columns:
        raise ValueError(f"{key_col!r}/{order_col!r} must exist")
    per_shard = max(1, ring_size // n_groups)
    cols = list(df.columns)
    out_schema = T.StructType([df.schema[c] for c in cols])
    state_schema = T.StructType(
        [T.StructField("ring", T.ArrayType(T.StringType()))]
    )
    ki, oi = cols.index(key_col), cols.index(order_col)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (ring,) = state.get if state.exists else ([],)
        ring = list(ring)
        seen = set(ring)
        for pdf in pdfs:
            pdf = pdf.sort_values(cols[oi], kind="stable")
            keep = []
            for pos, k in zip(pdf.index, pdf.iloc[:, ki]):
                k = "" if k is None else str(k)
                if k in seen:
                    continue  # duplicate within ring -> dropped
                keep.append(pos)
                seen.add(k)
                ring.append(k)
                if len(ring) > per_shard:
                    seen.discard(ring.pop(0))  # evict oldest (deque maxlen)
            if keep:
                yield pdf.loc[keep, cols]
        state.update((ring,))

    grouped = df.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_groups))
    ).groupBy("__shard")
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
