"""Second tranche of LLM-data-pipeline queries: corpus hygiene at scale.

Repetition signals (Gopher-style quality gates), benchmark contamination
(n-gram overlap decontamination), deterministic stratified sampling (corpus
mixing), and the keep-one-per-cluster dedup decision applied to the corpus.
All four are oracle-exact: counts and integer-exact divisions only — no
float summation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.operators import dedup as D
from liq_stream_spark.operators import text as X
from liq_stream_spark.plans import register
from liq_stream_spark.plans.llm_ops import (
    DUCK_SHINGLES,
    DUCK_TOKENS,
    _duck_bands_cte,
    _duck_minhash_cte,
)
from liq_stream_spark.plans.tables import load

# DuckDB token 2-grams / n-grams over T (1-based list ops mirror Spark's
# 1-based slice() in text.token_ngrams)
_DUCK_2GRAMS = (
    "list_transform(range(1, greatest(len(T)-1, 0)+1), "
    "i -> T[i] || ' ' || T[i+1])"
)


def _duck_ngrams(n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len(T)-{n - 1}, 0)+1), "
        f"i -> array_to_string(T[i:i+{n - 1}], ' '))"
    )


_T07_SQL = f"""
    WITH base AS (
      SELECT doc_id, {DUCK_TOKENS} AS T FROM documents WHERE trim(text) != ''
    ), toks AS (
      SELECT doc_id, unnest(T) AS g FROM base
    ), tc AS (
      SELECT doc_id, g, COUNT(*) AS c FROM toks GROUP BY doc_id, g
    ), ts AS (
      SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
             MAX(c) AS top_c
      FROM tc GROUP BY doc_id
    ), grams AS (
      SELECT doc_id, unnest({_DUCK_2GRAMS}) AS g FROM base
    ), gc AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ), gs AS (
      SELECT doc_id, SUM(c) AS n2,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup2
      FROM gc GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(ts.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(ts.n_distinct, 0)::BIGINT AS n_distinct_tokens,
           CASE WHEN coalesce(ts.n_tokens, 0) > 0
                THEN ts.top_c::DOUBLE / ts.n_tokens ELSE 0.0
           END AS top_token_frac,
           CASE WHEN coalesce(gs.n2, 0) > 0
                THEN gs.dup2::DOUBLE / gs.n2 ELSE 0.0
           END AS dup_2gram_frac
    FROM documents d
    LEFT JOIN ts ON ts.doc_id = d.doc_id
    LEFT JOIN gs ON gs.doc_id = d.doc_id
    """


@register(
    "t07_repetition_signals",
    _T07_SQL,
    doc="Gopher-style repetition quality signals: distinct-token counts, "
    "top-token occurrence share, duplicate-2-gram occurrence fraction "
    "(operators/text.repetition_signals). Two map-side-combinable hash "
    "aggs keyed (doc_id, gram); ratios are single IEEE divisions of exact "
    "integers, hence oracle-exact.",
)
def t07_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.repetition_signals(load(spark, sf_dir, "documents"))


_P03_N = 5
_P03_SQL = f"""
    WITH T AS (
      SELECT doc_id, {DUCK_TOKENS} AS T FROM documents
    ), cg AS (
      SELECT doc_id, unnest(list_distinct({_duck_ngrams(_P03_N)})) AS g
      FROM T WHERE doc_id % 97 != 0
    ), bg AS (
      SELECT DISTINCT g FROM (
        SELECT unnest(list_distinct({_duck_ngrams(_P03_N)})) AS g
        FROM T WHERE doc_id % 97 = 0
      )
    ), hits AS (
      SELECT doc_id, COUNT(*) AS n FROM cg JOIN bg USING (g) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(hits.n, 0)::BIGINT AS n_shared_ngrams,
           coalesce(hits.n, 0) > 0 AS contaminated
    FROM documents d
    LEFT JOIN hits ON hits.doc_id = d.doc_id
    WHERE d.doc_id % 97 != 0
    """


@register(
    "p03_contamination",
    _P03_SQL,
    doc="benchmark-contamination check (operators/text.contamination_flags): "
    "docs with doc_id % 97 == 0 stand in for the benchmark set; every other "
    "doc reports how many of its distinct 5-token-grams appear in the "
    "benchmark. The benchmark gram set is broadcast, so the corpus side "
    "never shuffles its grams — the decontamination shape that holds at "
    "100 TB (benchmark suites are KBs; the corpus is the big side).",
)
def p03_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    return X.contamination_flags(corpus, benchmark, n=_P03_N)


_P04_SQL = f"""
    WITH b AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5('sample-v1:' || doc_id::VARCHAR), 1, 8))::BIGINT
              % {X.SPLIT_MOD})::BIGINT AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket
    FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 8000 ELSE 2000 END
    """


@register(
    "p04_stratified_sample",
    _P04_SQL,
    doc="deterministic stratified downsampling for corpus mixing "
    "(operators/text.stratified_sample): keep 80% of English docs, 20% of "
    "every other language, membership a pure function of (salt, doc_id) — "
    "same md5-bucket construction as p02, so kept sets are stable under "
    "corpus growth and repartitioning. Narrow projection + filter, zero "
    "shuffle.",
)
def p04_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.stratified_sample(
        docs, "lang", {"en": 8000}, default_bp=2000
    ).select("doc_id", "lang", "bucket")


_D07_SQL = f"""
    WITH RECURSIVE {_duck_minhash_cte()},
    {_duck_bands_cte()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band, band_key)
      WHERE a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, w.comp
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.comp < e.dst
    ),
    cc AS (SELECT node, MIN(comp) AS comp FROM walk GROUP BY node),
    sizes AS (SELECT comp, COUNT(*) AS n FROM cc GROUP BY comp)
    SELECT d.doc_id,
           coalesce(sizes.n, 1)::BIGINT AS cluster_size
    FROM documents d
    LEFT JOIN cc ON cc.node = d.doc_id
    LEFT JOIN sizes ON sizes.comp = cc.comp
    WHERE cc.node IS NULL OR cc.node = cc.comp
    """


@register(
    "d07_dedup_survivors",
    _D07_SQL,
    doc="keep-one-per-cluster applied to the corpus "
    "(operators/dedup.dedup_survivors): canonical members and singletons "
    "survive with their cluster size; non-canonical near-dups drop. The "
    "cluster computation touches only docs appearing in LSH pairs; the "
    "corpus joins back on id equi-keys only.",
)
def d07_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_sig_arrays(docs)
    edges = D.lsh_star_edges(sigs)
    return D.dedup_survivors(docs, edges)


_D08_CAP = 40
_D08_SQL = f"""
    WITH sh0 AS (
      SELECT doc_id, unnest(list_distinct({DUCK_SHINGLES})) AS sh
      FROM documents
    ), kept AS (
      SELECT sh FROM (SELECT sh, COUNT(*) AS c FROM sh0 GROUP BY sh)
      WHERE c <= {_D08_CAP}
    ), sh AS (
      SELECT doc_id, sh FROM sh0 JOIN kept USING (sh)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
           n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.7
    """


@register(
    "d08_ngram_jaccard_capped",
    _D08_SQL,
    doc="the d04 inverted-index Jaccard with the max_doc_freq skew valve "
    "engaged (operators/dedup.ngram_jaccard_pairs(max_doc_freq=40)): hot "
    "shingles whose posting lists would join quadratically are dropped "
    "from intersection AND set sizes, so the result is EXACT Jaccard over "
    "the capped shingle universe — and therefore still fully "
    "DuckDB-oracled. This is the parameterization that survives 100 TB; "
    "d04 (uncapped) remains the reference setting.",
)
def d08_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.7,
        max_doc_freq=_D08_CAP,
    )


_BPE_RE_SQL_2 = X.BPE_PRETOKEN_RE.replace("'", "''")
_P05_SQL = f"""
    WITH b AS (
      SELECT doc_id, lang, text,
             (('0x' || substr(md5('sample-v1:' || doc_id::VARCHAR), 1, 8))::BIGINT
              % {X.SPLIT_MOD})::BIGINT AS bucket
      FROM documents
    ), kept AS (
      SELECT * FROM b
      WHERE bucket < CASE WHEN lang = 'en' THEN 8000 ELSE 2000 END
    )
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           SUM(coalesce(len(regexp_extract_all(text, '{_BPE_RE_SQL_2}')), 0))::BIGINT
               AS total_bpe_tokens
    FROM kept GROUP BY lang
    """


@register(
    "p05_corpus_mix_budget",
    _P05_SQL,
    doc="corpus-mix budget report: after the p04 stratified sample, the "
    "per-language document count and total BPE-pretoken budget — the "
    "number a training-data pipeline actually plans against. Integer "
    "sums, hence oracle-exact; one narrow projection + one small agg.",
)
def p05_corpus_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    kept = X.stratified_sample(docs, "lang", {"en": 8000}, default_bp=2000)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(X.bpe_token_count("text")).cast("long").alias("total_bpe_tokens"),
    )
