"""Third tranche of LLM-data-pipeline queries: corpus shaping.

Sequence packing (the GPT concat-then-chunk map), overlapping retrieval
chunking, PII redaction, C4-style line cleaning — all DuckDB-oracled with
exact integers / identical RE2-safe regexes — and product-quantization ANN
(rows-only; recall gated in tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.operators import corpus as C
from liq_stream_spark.operators import similarity as S
from liq_stream_spark.operators.corpus import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    _PACK_BUCKETS,
)
from liq_stream_spark.plans import register
from liq_stream_spark.plans.llm_ops import DUCK_TOKENS
from liq_stream_spark.plans.tables import load
from liq_stream_spark.operators.text import BPE_PRETOKEN_RE

_P06_CTX = 512
_BPE_SQL = BPE_PRETOKEN_RE.replace("'", "''")

_P06_SQL = f"""
    WITH b AS (
      SELECT doc_id,
             coalesce(len(regexp_extract_all(text, '{_BPE_SQL}')), 0)::BIGINT
                 AS n_tokens,
             ('0x' || substr(md5('pack-v1:' || doc_id::VARCHAR), 1, 15))::BIGINT
                 AS h
      FROM documents
    ), l AS (
      SELECT doc_id, n_tokens, h, h % {_PACK_BUCKETS} AS bkt,
             SUM(n_tokens) OVER (
               PARTITION BY h % {_PACK_BUCKETS} ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS local_end
      FROM b
    ), t AS (
      SELECT bkt, SUM(n_tokens) AS tot FROM l GROUP BY bkt
    ), o AS (
      SELECT bkt,
             coalesce(SUM(tot) OVER (
               ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS base
      FROM t
    )
    SELECT doc_id, n_tokens,
           (base + local_end - n_tokens)::BIGINT AS start_offset,
           ((base + local_end - n_tokens) // {_P06_CTX})::BIGINT AS first_chunk,
           ((base + local_end - n_tokens + greatest(n_tokens - 1, 0))
             // {_P06_CTX})::BIGINT AS last_chunk
    FROM l JOIN o USING (bkt)
    """


@register(
    "p06_pack_offsets",
    _P06_SQL,
    doc="GPT-style sequence-packing map (operators/corpus.pack_offsets): "
    "docs concatenate in deterministic md5 order and the token stream cuts "
    f"into {_P06_CTX}-token windows; each doc reports (start_offset, "
    "first_chunk, last_chunk). The global prefix sum is DISTRIBUTED — 256 "
    "md5 buckets with parallel per-bucket windows + a 256-row base-offset "
    "join — no single global sort task, which is what makes a corpus-wide "
    "running offset survive 100 TB. All exact integers, oracle-exact.",
)
def p06_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.pack_offsets(load(spark, sf_dir, "documents"), _P06_CTX)


_P07_CHUNK, _P07_STRIDE = 128, 96

_P07_SQL = f"""
    WITH T AS (
      SELECT doc_id, {DUCK_TOKENS} AS T FROM documents WHERE trim(text) != ''
    ), st AS (
      SELECT doc_id, T, unnest(range(0, len(T), {_P07_STRIDE})) AS cs
      FROM T
    )
    SELECT doc_id,
           (cs // {_P07_STRIDE})::BIGINT AS chunk_id,
           cs::BIGINT AS chunk_start,
           len(T[cs + 1 : cs + {_P07_CHUNK}])::BIGINT AS n_chunk_tokens,
           array_to_string(T[cs + 1 : cs + {_P07_CHUNK}], ' ') AS chunk_text
    FROM st
    """


@register(
    "p07_doc_chunks",
    _P07_SQL,
    doc="overlapping retrieval-chunking (operators/corpus.doc_chunks): "
    f"{_P07_CHUNK}-token windows at stride {_P07_STRIDE} "
    f"({_P07_CHUNK - _P07_STRIDE}-token overlap), final chunk short, empty "
    "docs emit nothing. Per-row sequence/slice + posexplode — narrow, "
    "shuffle-free, the chunk id is start//stride in both engines.",
)
def p07_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.doc_chunks(load(spark, sf_dir, "documents"), _P07_CHUNK, _P07_STRIDE)


_T08_SQL = f"""
    WITH a AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
             regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM documents
    ), b AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(t1, '{PII_IPV4_RE}'))::BIGINT AS n_ips,
             regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
      FROM a
    )
    SELECT doc_id,
           regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted_text,
           n_emails, n_ips,
           len(regexp_extract_all(t2, '{PII_PHONE_RE}'))::BIGINT AS n_phones
    FROM b
    """


@register(
    "t08_pii_redaction",
    _T08_SQL,
    doc="PII redaction (operators/corpus.pii_redact): emails -> <EMAIL>, "
    "IPv4 -> <IP>, phone-like digit runs -> <PHONE>, applied sequentially "
    "so an email's digits never double-count as a phone; counts per "
    "category. RE2-safe patterns (no lookarounds) run bit-identically in "
    "Java regex and DuckDB; the cross-engine behavior on real PII strings "
    "is pinned in tests/test_corpus_shaping.py (the fixture itself is "
    "PII-free — zero counts are still value-hashed over 500 rows).",
)
def t08_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.pii_redact(load(spark, sf_dir, "documents"))


_T09_MIN_WORDS = 3

_T09_SQL = f"""
    WITH L AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
    ), K AS (
      SELECT doc_id, ls,
             list_filter(ls, ln ->
               len(list_filter(regexp_split_to_array(trim(ln), '\\s+'),
                               w -> w != '')) >= {_T09_MIN_WORDS}
               AND NOT contains(lower(ln), '{{')
               AND NOT contains(lower(ln), '}}')
               AND NOT contains(lower(ln), 'lorem ipsum')
               AND NOT contains(lower(ln), 'javascript')
             ) AS kept
      FROM L
    )
    SELECT doc_id, len(ls)::BIGINT AS n_lines,
           len(kept)::BIGINT AS n_kept_lines,
           array_to_string(kept, chr(10)) AS clean_text
    FROM K
    """


@register(
    "t09_line_quality_filter",
    _T09_SQL,
    doc="C4-style line cleaning (operators/corpus.quality_line_filter): "
    f"keep lines with >= {_T09_MIN_WORDS} words, no curly braces, no "
    "'lorem ipsum'/'javascript'; rejoin survivors. Higher-order filter "
    "over the line array, per-row, shuffle-free. The fixture is "
    "single-line (n_lines=1 everywhere) — multi-line and terminal-punct "
    "semantics are pinned by unit tests.",
)
def t09_line_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.quality_line_filter(
        load(spark, sf_dir, "documents"), min_words=_T09_MIN_WORDS
    )


# -- DuckDB oracle for the FULL PQ pipeline ---------------------------------
# The PQ index build is deterministic end-to-end (seeds = the n_codes
# smallest-id vectors' subvectors, fixed Lloyd rounds, argmin ties toward
# the smaller code) and the output is integer ranks — so the whole
# pipeline (unit-normalize -> subspace split -> 2 Lloyd rounds -> encode
# -> ADC scoring -> rank) is reproducible in SQL. Cross-engine float
# hazards are confined to argmin/rank near-ties; verified exact and
# self-stable at sf0.001/0.01/0.1 x repeated runs.
_PQ_M = 16
_PQ_CODES = 16
_PQ_DSUB = 4  # embeddings are dim 64; 64 / m
_PQ_K = 10


def _pq_dist2(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {_PQ_DSUB}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_assign_sql(sub: str, books: str) -> str:
    # distances round to 9 dp before the argmin rank (mirroring Spark's
    # _pq_assign) so near-ties fall to the deterministic code tiebreak on
    # both engines instead of an ulp-sensitive float comparison
    return f"""(
      SELECT vec_id, s, code, subvec FROM (
        SELECT t.vec_id, t.s, b.code, t.subvec,
               row_number() OVER (PARTITION BY t.vec_id, t.s
                   ORDER BY round({_pq_dist2("t.subvec", "b.centroid")}, 9),
                            b.code)
                   AS rn
        FROM {sub} t JOIN {books} b USING (s)
      ) WHERE rn = 1
    )"""


def _pq_means_sql(a: str) -> str:
    return f"""(
      SELECT s, code, list(m ORDER BY i) AS centroid FROM (
        SELECT a.s, a.code, ii.i, avg(a.subvec[ii.i]) AS m
        FROM {a} a,
             (SELECT unnest(generate_series(1, {_PQ_DSUB})) AS i) ii
        GROUP BY a.s, a.code, ii.i
      ) GROUP BY s, code
    )"""


def _pq_oracle_sql() -> str:
    return f"""
    WITH uv AS (
      SELECT vec_id,
             CASE WHEN sqrt(list_sum(list_transform(
                        embedding::DOUBLE[], x -> x * x))) = 0
                  THEN embedding::DOUBLE[]
                  ELSE list_transform(embedding::DOUBLE[],
                         x -> x / sqrt(list_sum(list_transform(
                                embedding::DOUBLE[], y -> y * y))))
             END AS u
      FROM embeddings
    ),
    ss AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s),
    sub AS (
      SELECT vec_id, ss.s,
             uv.u[ss.s * {_PQ_DSUB} + 1 : (ss.s + 1) * {_PQ_DSUB}] AS subvec
      FROM uv, ss
    ),
    seed_ids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT vec_id FROM uv ORDER BY vec_id LIMIT {_PQ_CODES})
    ),
    b0 AS (
      SELECT sub.s, seed_ids.code, sub.subvec AS centroid
      FROM sub JOIN seed_ids USING (vec_id)
    ),
    a1 AS {_pq_assign_sql("sub", "b0")},
    m1 AS {_pq_means_sql("a1")},
    a2 AS {_pq_assign_sql("sub", "m1")},
    m2 AS {_pq_means_sql("a2")},
    codes AS (
      SELECT vec_id AS neighbor_id, s, code
      FROM {_pq_assign_sql("sub", "m2")} t
    ),
    qsub AS (SELECT * FROM sub WHERE vec_id < 20),
    qtable AS (
      SELECT q.vec_id AS query_id, q.s, b.code,
             round({_pq_dist2("q.subvec", "b.centroid")}, 9) AS pd
      FROM qsub q JOIN m2 b USING (s)
    ),
    scored AS (
      -- pd and the re-rounded sum mirror Spark's pq_topk: identical
      -- addends per engine, and the last ulp of the sum (addition order
      -- differs) never decides a rank
      SELECT qt.query_id, c.neighbor_id, round(sum(qt.pd), 9) AS adist,
             count(*) AS nm
      FROM codes c JOIN qtable qt ON qt.s = c.s AND qt.code = c.code
      WHERE qt.query_id != c.neighbor_id
      GROUP BY qt.query_id, c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rank
      FROM scored WHERE nm = {_PQ_M}
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_PQ_K}
    """


@register(
    "s07_pq_topk",
    _pq_oracle_sql(),
    doc="product-quantization ANN top-k (operators/similarity.pq_topk): "
    "unit-normalized vectors split into 16 subspaces x 16 L2-k-means "
    "codes -> 16-byte codes (16x smaller than float32 at dim 64, THE "
    "memory/IO win that lets 100 TB of embeddings fit an executor "
    "fleet); queries rank by asymmetric distance against broadcast "
    "codebooks — the corpus never ships raw floats. GENUINELY oracled: "
    "the deterministic index build (smallest-id seeds, 2 Lloyd rounds, "
    "tie-to-smaller-code argmin) and ADC ranking are reproduced "
    "end-to-end in DuckDB SQL; recall vs the exact baseline is "
    "additionally gated in tests/test_corpus_shaping.py.",
)
def s07_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark import store
    from liq_stream_spark.plans.index_cache import ensure_ann_index

    emb = load(spark, sf_dir, "embeddings")
    # offline build persisted once per corpus version (index_cache ->
    # store.write_pq_index); the probe is pure ADC over the stored code
    # table — no training, no encode pass in this plan
    path = ensure_ann_index(spark, emb, sf_dir, n_cells=16, m=16)
    return store.pq_topk_from_store(
        spark, emb.filter(F.col("vec_id") < 20), path, k=10
    )


_D09_N = 13
_D09_NGRAMS = (
    f"list_transform(range(1, greatest(len(T)-{_D09_N - 1}, 0)+1), "
    f"i -> array_to_string(T[i:i+{_D09_N - 1}], ' '))"
)
_D09_SQL = f"""
    WITH T AS (
      SELECT doc_id, {DUCK_TOKENS} AS T FROM documents
    ), base AS (
      SELECT doc_id, list_distinct({_D09_NGRAMS}) AS gs FROM T
    ), g AS (
      SELECT doc_id, unnest(gs) AS g FROM base
    ), f AS (
      SELECT g FROM (SELECT g, COUNT(*) AS c FROM g GROUP BY g) WHERE c >= 2
    ), dup AS (
      SELECT doc_id, COUNT(*) AS n_dup FROM g JOIN f USING (g) GROUP BY doc_id
    )
    SELECT b.doc_id,
           len(b.gs)::BIGINT AS n_grams,
           coalesce(dup.n_dup, 0)::BIGINT AS n_dup_grams,
           CASE WHEN len(b.gs) > 0
                THEN coalesce(dup.n_dup, 0)::DOUBLE / len(b.gs)
                ELSE 0.0 END AS dup_gram_frac
    FROM base b LEFT JOIN dup ON dup.doc_id = b.doc_id
    """


@register(
    "d09_duplicate_ngrams",
    _D09_SQL,
    doc="exact duplicate-substring signal at 13-token-gram granularity "
    "(operators/dedup.duplicate_ngram_stats — the practical form of Lee "
    "et al.'s exact-substring dedup): per doc, how many of its distinct "
    "13-grams appear in any other document. One map-side-combinable "
    "doc-frequency agg + one gram equi-join; max_doc_freq is the "
    "boilerplate skew valve. Integer counts + one division — oracle-exact.",
)
def d09_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.dedup import duplicate_ngram_stats

    return duplicate_ngram_stats(load(spark, sf_dir, "documents"), n=_D09_N)


@register(
    "s08_ivfpq_topk",
    _pq_oracle_sql(),
    doc="IVF-PQ ANN (operators/similarity.ivfpq_topk — the FAISS-IVFPQ "
    "shape): the IVF router prunes WHICH vectors get scored, PQ codes "
    "shrink WHAT is stored/shipped; candidates score by ADC against "
    "broadcast per-query distance tables. Registered at its nprobe = "
    "n_cells degeneration, where the router prunes nothing and IVF-PQ "
    "is provably EQUAL to the full PQ scan (pinned in "
    "tests/test_corpus_shaping.py) — so it shares s07's genuine DuckDB "
    "oracle and the driver check exercises the composed "
    "router+codes+ADC machinery with an exact gate. The PRUNED path "
    "(nprobe=4/16) keeps its recall gate in tests.",
)
def s08_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark import store
    from liq_stream_spark.plans.index_cache import ensure_ann_index

    emb = load(spark, sf_dir, "embeddings")
    # both deterministic index halves persisted once per corpus version
    # (index_cache -> store.write_ivf_index/write_pq_index); the probe
    # prunes the stored code table to the probed cells' partitions and
    # ADC-scores the survivors — no training, no encode pass here
    path = ensure_ann_index(spark, emb, sf_dir, n_cells=16, m=16)
    return store.ivfpq_topk_from_store(
        spark, emb.filter(F.col("vec_id") < 20), path, k=10, nprobe=16
    )


_D10_SQL = None  # assembled below (needs the minhash CTE from llm_ops)


def _d10_sql() -> str:
    from liq_stream_spark.plans.llm_ops import (
        _duck_bands_cte,
        _duck_minhash_cte,
    )

    return f"""
    WITH {_duck_minhash_cte()},
    {_duck_bands_cte()},
    newb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
    corpb AS (
      SELECT DISTINCT band, band_key FROM bands WHERE doc_id % 5 != 0
    ),
    near AS (SELECT DISTINCT doc_id FROM newb JOIN corpb USING (band, band_key)),
    exact AS (
      SELECT DISTINCT n.doc_id
      FROM documents n JOIN documents c
        ON n.text = c.text AND c.doc_id % 5 != 0
      WHERE n.doc_id % 5 = 0
    )
    SELECT d.doc_id,
           (exact.doc_id IS NOT NULL) AS exact_dup,
           (near.doc_id IS NOT NULL) AS near_dup
    FROM documents d
    LEFT JOIN exact ON exact.doc_id = d.doc_id
    LEFT JOIN near ON near.doc_id = d.doc_id
    WHERE d.doc_id % 5 = 0
    """


@register(
    "d10_incremental_dedup",
    _d10_sql(),
    doc="incremental-ingest dedup (operators/dedup.dedup_incremental): "
    "docs with doc_id %% 5 == 0 stand in for the new crawl batch, the "
    "rest for the existing corpus; per new doc, exact_dup (text match) "
    "and near_dup (shares an LSH band key, same b=4/r=4 banding as d03). "
    "The NEW side broadcasts into both probes — the 100-TB corpus never "
    "reshuffles for an ingest batch. Fully DuckDB-oracled.",
)
def d10_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.dedup import dedup_incremental

    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup_incremental(new, corpus)


_P08_SHARDS = 64
_P08_SQL = f"""
    WITH b AS (
      SELECT doc_id,
             coalesce(len(regexp_extract_all(text, '{_BPE_SQL}')), 0)::BIGINT
                 AS n_tokens,
             (('0x' || substr(md5('shard-v1:' || doc_id::VARCHAR), 1, 15))::BIGINT
              % {_P08_SHARDS}) AS shard_id
      FROM documents
    )
    SELECT shard_id::BIGINT AS shard_id,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS n_tokens
    FROM b GROUP BY shard_id
    """


@register(
    "p08_shard_manifest",
    _P08_SQL,
    doc="training-shard manifest — the write-side of the pipeline: every "
    "doc lands in one of 64 shards by md5 (pure function of id: stable "
    "under repartition/growth, and uniform so no shard becomes the "
    "straggler file); the manifest reports per-shard doc count and BPE "
    "token budget. One narrow projection + one small agg; the actual "
    "write is `repartition(shard_id).write.partitionBy(shard_id)` on the "
    "same column. Integer sums — oracle-exact.",
)
def p08_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators.corpus import _order_hash
    from liq_stream_spark.operators.text import bpe_token_count

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            (_order_hash("doc_id", "shard-v1") % _P08_SHARDS).alias("shard_id"),
            bpe_token_count("text").alias("n_tokens"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
