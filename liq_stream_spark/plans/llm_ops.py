"""LLM-data-pipeline operator queries over documents/embeddings.

Oracle strategy: the text operators are built on a deterministic base-131
polynomial hash (operators/text.py) that the DuckDB SQL below reproduces
with list_transform/list_reduce — so MinHash signatures, LSH pairs, SimHash
values and fingerprints hash-match the oracle EXACTLY, not approximately.
Embedding similarity compares integer outputs (ranks, ids, votes) so float
summation order can't flip a comparison.

The oracle SQL strings are generated from the same constants the Spark
operators use (MINHASH_PERMS, STOPWORDS, LANG_MARKERS) — one source of
truth, two engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.operators import dedup as D
from liq_stream_spark.operators import similarity as S
from liq_stream_spark.operators import text as X
from liq_stream_spark.plans import register
from liq_stream_spark.plans.tables import load

# ---------------------------------------------------------------------------
# DuckDB SQL fragments mirroring operators/text.py primitives
# ---------------------------------------------------------------------------

M32 = X.MASK32
M31 = D.MERSENNE31

# n=3 char shingle hashes of `text`
DUCK_SHINGLES = (
    "list_transform(range(1, greatest(length(text)-2, 0)+1), "
    "i -> (ascii(substr(text, i::INT, 1))::BIGINT*17161 "
    "+ ascii(substr(text, i::INT+1, 1))::BIGINT*131 "
    f"+ ascii(substr(text, i::INT+2, 1))::BIGINT) % {M32})"
)

# whitespace-token polynomial hashes of `text`
DUCK_TOKEN_HASHES = (
    "list_transform(regexp_split_to_array(trim(text), '\\s+'), "
    "w -> list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)), "
    f"(a, x) -> (a*131 + x) % {M32}))"
)

# independent base-137 family — the high 32 bits of the 64-bit SimHash
DUCK_TOKEN_HASHES_HI = (
    "list_transform(regexp_split_to_array(trim(text), '\\s+'), "
    "w -> list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)), "
    f"(a, x) -> (a*137 + x) % {M32}))"
)

# 64-bit SimHash signatures as one signed BIGINT — shared by t04 and d05.
# The sign-safe pack (hi - 2^32*[hi>=2^31])*2^32 + lo avoids 1<<63, which
# overflows DuckDB's checked BIGINT shift (text.combine_simhash64 mirrors it).
DUCK_SIMHASH64 = f"""
    toks AS (
      SELECT doc_id, unnest({DUCK_TOKEN_HASHES}) AS h_lo,
             unnest({DUCK_TOKEN_HASHES_HI}) AS h_hi
      FROM documents
    ), bits AS (
      SELECT doc_id, i,
             SUM(CASE WHEN i < 32 THEN ((h_lo >> i::INT) & 1)
                      ELSE ((h_hi >> (i::INT - 32)) & 1) END * 2 - 1) AS s
      FROM toks, range(0, 64) t(i)
      GROUP BY doc_id, i
    ), halves AS (
      SELECT doc_id,
             SUM(CASE WHEN i < 32 AND s > 0
                 THEN (1::BIGINT << i::INT) ELSE 0 END) AS lo,
             SUM(CASE WHEN i >= 32 AND s > 0
                 THEN (1::BIGINT << (i::INT - 32)) ELSE 0 END) AS hi
      FROM bits GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id,
             ((CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
              * 4294967296 + lo)::BIGINT AS simhash
      FROM halves
    )
"""

DUCK_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
_PUNCT_SQL = "'[.,;:!?''\"()\\[\\]{}-]'"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_sw = ", ".join(f"'{w}'" for w in X.STOPWORDS)


_T01_SQL = f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len({DUCK_TOKENS}) END::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars_measured,
           len(regexp_extract_all(text, {_PUNCT_SQL}))::BIGINT AS n_punct,
           len(list_filter({DUCK_TOKENS}, w -> lower(w) IN ({_sw})))::BIGINT AS n_stopwords,
           CASE WHEN trim(text) = '' THEN 0.0
                ELSE length(text)::DOUBLE / len({DUCK_TOKENS}) END AS avg_token_len,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE len(regexp_extract_all(text, {_PUNCT_SQL}))::DOUBLE / length(text) END AS punct_ratio,
           CASE WHEN trim(text) = '' THEN 0.0
                ELSE len(list_filter({DUCK_TOKENS}, w -> lower(w) IN ({_sw})))::DOUBLE
                     / len({DUCK_TOKENS}) END AS stopword_ratio,
           -- every ratio term below uses the SAME zero-guarded form as
           -- the ratio columns above (ratio = 0.0 for empty/blank text),
           -- mirroring quality_features' F.when guards — an unguarded
           -- x/0 here would score empty docs' punct term 0 where Spark
           -- scores it 1 (ratio 0.0 <= 0.2)
           ((CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                             ELSE len({DUCK_TOKENS}) END)
                  BETWEEN 10 AND 10000 THEN 1 ELSE 0 END)
          + (CASE WHEN (CASE WHEN trim(text) = '' THEN 0.0
                             ELSE length(text)::DOUBLE / len({DUCK_TOKENS}) END)
                  BETWEEN 3 AND 12 THEN 1 ELSE 0 END)
          + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                             ELSE len(regexp_extract_all(text, {_PUNCT_SQL}))::DOUBLE
                                  / length(text) END)
                  <= 0.2 THEN 1 ELSE 0 END)
          + (CASE WHEN (CASE WHEN trim(text) = '' THEN 0.0
                             ELSE len(list_filter({DUCK_TOKENS}, w -> lower(w) IN ({_sw})))::DOUBLE
                                  / len({DUCK_TOKENS}) END)
                  >= 0.05 THEN 1 ELSE 0 END))::BIGINT AS quality_score
    FROM documents
    """


@register(
    "t01_doc_stats",
    _T01_SQL,
    doc="token/char/punct/stopword stats + composite quality score "
    "(operators/text.quality_features) — the cheap pre-filter stage.",
)
def t01_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_features(load(spark, sf_dir, "documents"))


def _duck_lang_sql() -> str:
    score_cols = []
    for lang, markers in X.LANG_MARKERS.items():
        mk = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter({DUCK_TOKENS}, w -> lower(w) IN ({mk})))::BIGINT AS score_{lang}"
        )
    langs = sorted(X.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = f"CASE WHEN {best} = 0 THEN 'und' " + " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
    WITH scored AS (SELECT doc_id, {', '.join(score_cols)} FROM documents)
    SELECT doc_id, {', '.join('score_' + l for l in langs)},
           {pred} AS pred_lang
    FROM scored
    """


@register(
    "t02_lang_id",
    _duck_lang_sql(),
    doc="marker-word language ID heuristic (operators/text.lang_id).",
)
def t02_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.lang_id(load(spark, sf_dir, "documents"))


@register(
    "t03_fingerprint",
    f"""
    SELECT doc_id,
           (CASE WHEN text IS NULL OR length(text) < 3 THEN 0
                 ELSE list_sum(list_transform(range(1, greatest(length(text)-2, 0)+1),
                      i -> i * ((ascii(substr(text, i::INT, 1))::BIGINT*17161
                               + ascii(substr(text, i::INT+1, 1))::BIGINT*131
                               + ascii(substr(text, i::INT+2, 1))::BIGINT) % {M32}))) % {M32}
            END)::BIGINT AS fp
    FROM documents
    """,
    doc="position-weighted rolling-hash document fingerprint "
    "(operators/text.fingerprint) — exact integer match vs oracle.",
)
def t03_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint("text").alias("fp"))


@register(
    "t04_simhash",
    f"""
    WITH {DUCK_SIMHASH64}
    SELECT doc_id, simhash FROM sigs
    """,
    doc="64-bit SimHash signatures: bits 0-31 base-131 token hashes, bits "
    "32-63 the independent base-137 family (operators/dedup.simhash_table; "
    "single-row HOF form operators/text.simhash64) — exact integer match "
    "vs oracle.",
)
def t04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_table(load(spark, sf_dir, "documents"))


_BPE_RE_SQL = X.BPE_PRETOKEN_RE.replace("'", "''")


@register(
    "t05_token_counts",
    f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len({DUCK_TOKENS}) END::BIGINT AS n_ws_tokens,
           coalesce(len(regexp_extract_all(text, '{_BPE_RE_SQL}')), 0)::BIGINT
               AS n_bpe_tokens
    FROM documents
    """,
    doc="token counting two ways: whitespace tokens and GPT-2-style BPE "
    "pretokens (operators/text.bpe_token_count) — the training-data budget "
    "proxy. The pretokenizer regex is lookahead-free so the IDENTICAL "
    "pattern runs in Java regex (Spark) and RE2 (DuckDB): exact oracle.",
)
def t05_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_ws_tokens"),
        X.bpe_token_count("text").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "d01_dedup_exact",
    """
    SELECT text, CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY text
    """,
    doc="exact dedup: hash-groupBy on content, min id as canonical "
    "(operators/dedup.dedup_exact).",
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(load(spark, sf_dir, "documents"), "text", "doc_id")


def _duck_bands_cte() -> str:
    """The banded LSH key CTE (4 bands x 4 rows over the 16-perm
    signatures) — ONE definition for every oracle that mirrors
    operators/dedup._banded_keys, so a banding change cannot silently
    desynchronize a subset of the d03/d06/d07/d10/d12/d14/d15 oracles."""
    return (
        """bands AS (
      SELECT doc_id, (perm_id // 4) AS band,
             string_agg(minhash::VARCHAR, ',' ORDER BY perm_id) AS band_key
      FROM sigs GROUP BY doc_id, (perm_id // 4)
    )"""
    )


def _duck_band_pairs_cte() -> str:
    """CTE 'pairs(id_a, id_b)' — distinct a<b LSH-bucket co-occurrence
    pairs over the bands CTE, mirroring operators/dedup.lsh_candidate
    pair generation. ONE definition for d06/p13/p14."""
    return """pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band, band_key)
      WHERE a.doc_id < b.doc_id
    )"""


def _duck_components_ctes(pairs_src: str = "pairs") -> str:
    """edges/nodes/walk/cc recursive-CTE chain turning an (id_a, id_b)
    pair relation into min-label connected components — the DuckDB
    mirror of operators/dedup.connected_components. ONE definition for
    every oracle that clusters (d06/d14/p13/p14); ``pairs_src`` names
    the upstream pair CTE (d14 feeds its Jaccard-verified pairs)."""
    return f"""edges AS (
      SELECT id_a AS src, id_b AS dst FROM {pairs_src}
      UNION SELECT id_b, id_a FROM {pairs_src}
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, w.comp
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.comp < e.dst
    ),
    cc AS (SELECT node, MIN(comp) AS comp FROM walk GROUP BY node)"""


def _duck_minhash_cte() -> str:
    """CTE 'sigs(doc_id, perm_id, minhash)' mirroring minhash_signatures."""
    perms = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(D.MINHASH_PERMS)
    )
    return f"""
    perms(perm_id, a, b) AS (VALUES {perms}),
    sigs AS (
      SELECT d.doc_id, p.perm_id::BIGINT AS perm_id,
             coalesce(list_min(list_transform({DUCK_SHINGLES},
                      x -> (p.a * x + p.b) % {M31})), {M31})::BIGINT AS minhash
      FROM documents d, perms p
    )
    """


@register(
    "d02_minhash_signatures",
    f"WITH {_duck_minhash_cte()} SELECT doc_id, perm_id, minhash FROM sigs",
    doc="k=16 MinHash signatures over 3-gram shingles with fixed integer "
    "permutations (operators/dedup.minhash_signatures) — exact oracle match.",
)
def d02_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(load(spark, sf_dir, "documents"))


@register(
    "d03_minhash_lsh_pairs",
    f"""
    WITH {_duck_minhash_cte()},
    {_duck_bands_cte()}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b USING (band, band_key)
    WHERE a.doc_id < b.doc_id
    """,
    doc="banded MinHash-LSH candidate pairs (b=4, r=4): equi-join on band "
    "key, no cross join (operators/dedup.lsh_candidate_pairs).",
)
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_sig_arrays(load(spark, sf_dir, "documents"))
    return D.lsh_candidate_pairs_banded(sigs, max_bucket=None)


@register(
    "d04_ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({DUCK_SHINGLES})) AS sh FROM documents
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
    """,
    doc="exact n-gram Jaccard pairs >= 0.7 via shingle inverted-index join "
    "(operators/dedup.ngram_jaccard_pairs).",
)
def d04_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.7
    )


@register(
    "d05_simhash_near_pairs",
    f"""
    WITH {DUCK_SIMHASH64}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs (Hamming <= 3) with 16-bit-block candidate "
    "generation (operators/dedup.simhash_near_pairs). The blocking is "
    "pigeonhole-LOSSLESS for Hamming <= 3 over 4 blocks, so the bucketed "
    "Spark plan is checkable against the exact pairwise-popcount oracle "
    "(the oracle cross-join is the sf0.01 verifier; Spark never "
    "cross-joins).",
)
def d05_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(load(spark, sf_dir, "documents"))


@register(
    "t06_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS term
      FROM documents WHERE trim(text) != ''
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT doc_id, term, tf, df,
             tf * ln((SELECT COUNT(*) FROM documents)::DOUBLE / df) AS tfidf
      FROM tf JOIN dfreq USING (term)
    ), ranked AS (
      SELECT doc_id, term, tf, df,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM ranked WHERE rank <= 3
    """,
    doc="per-doc top-3 TF-IDF keywords (operators/text.tfidf_top_terms): "
    "explode -> two map-side-combinable hash aggs (term freq, doc freq) "
    "-> broadcast df/N back -> per-doc top-k window. The ln-based score "
    "orders the output but stays OUT of it (libm last-ulp differences "
    "across engines; ties are same-(tf,df) hence bitwise-stable within "
    "each engine, distinct classes are >= 1e-9 apart on this corpus).",
)
def t06_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.tfidf_top_terms(load(spark, sf_dir, "documents"), k=3)


@register(
    "p02_hash_split",
    f"""
    WITH b AS (
      SELECT doc_id,
             (('0x' || substr(md5('split-v1:' || doc_id::VARCHAR), 1, 8))::BIGINT
              % {X.SPLIT_MOD})::BIGINT AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="deterministic 90/5/5 train/val/test split "
    "(operators/text.hash_split): bucket = int(md5('<salt>:<id>')[:8]) % 10k, "
    "reproduced bit-for-bit by the oracle (conv/hex-cast). Membership is "
    "a property of the row (salt + id), not the job: growing the corpus "
    "or repartitioning never moves an existing row between splits. Narrow "
    "projection, zero shuffle.",
)
def p02_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.hash_split(docs).select("doc_id", "bucket", "split")


@register(
    "d06_dedup_clusters",
    f"""
    WITH RECURSIVE {_duck_minhash_cte()},
    {_duck_bands_cte()},
    {_duck_band_pairs_cte()},
    {_duck_components_ctes()},
    sizes AS (SELECT comp, COUNT(*) AS n FROM cc GROUP BY comp)
    SELECT cc.node AS doc_id, cc.comp AS cluster_id,
           CAST(sizes.n AS BIGINT) AS cluster_size,
           cc.node = cc.comp AS is_canonical
    FROM cc JOIN sizes USING (comp)
    """,
    doc="transitive dedup CLUSTERS over the d03 LSH buckets "
    "(operators/dedup.connected_components): min-label propagation with "
    "pointer jumping, O(log diameter) rounds of equi-join shuffles — the "
    "step that turns pairwise near-dup hits into keep-one-per-cluster "
    "decisions. The components input is the STAR edge set (each bucket "
    "member -> bucket min, operators/dedup.lsh_star_edges): same "
    "components as the d03 pair cliques with O(|bucket|) edges instead "
    "of O(|bucket|^2). Oracle: DuckDB recursive CTE computing min "
    "reachable id over the full pair cliques — equality PROVES the "
    "star/clique component equivalence.",
)
def d06_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_sig_arrays(load(spark, sf_dir, "documents"))
    edges = D.lsh_star_edges(sigs)
    return D.dedup_clusters(edges)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_DUCK_COS = "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"


_S01_SQL = f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos
      FROM q, embeddings c WHERE q.vec_id != c.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """

_S03_SQL = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """


@register(
    "s01_cosine_topk",
    _S01_SQL,
    doc="brute-force cosine top-10 for 20 query vectors; integer outputs "
    "(operators/similarity.cosine_topk).",
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb.filter(F.col("vec_id") < 20), emb, k=10)


@register(
    "s02_knn_label_vote",
    f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nb_label,
             {_DUCK_COS} AS cos
      FROM q, embeddings c WHERE q.vec_id != c.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, nb_label,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    ), votes AS (
      SELECT query_id, nb_label, COUNT(*) AS v
      FROM ranked WHERE rank <= 10 GROUP BY query_id, nb_label
    ), best AS (
      SELECT query_id, nb_label,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY v DESC, nb_label) AS rn
      FROM votes
    )
    SELECT query_id, CAST(nb_label AS BIGINT) AS pred_label
    FROM best WHERE rn = 1
    """,
    doc="k-NN majority-label classification over the top-10 neighbors "
    "(operators/similarity.knn_label_vote).",
)
def s02_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.knn_label_vote(emb.filter(F.col("vec_id") < 20), emb, k=10)


@register(
    "s03_cosine_near_dup_pairs",
    _S03_SQL,
    doc="embedding-cosine near-duplicate pairs, EXACT crossJoin variant — "
    "VERIFIER ONLY (threshold 0.4; the fixture embeddings are "
    "near-orthogonal, so the exact answer is checkable by the oracle while "
    "sign-LSH recall is <1 at this threshold by design). The default "
    "operator is the bucketed s05 "
    "(operators/similarity.cosine_near_dup_pairs_exact).",
)
def s03_cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_near_dup_pairs_exact(
        load(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "s04_cosine_topk_lsh",
    _S01_SQL,
    doc="sign-LSH bucketed approximate top-k (operators/similarity."
    "cosine_topk_lsh) — the equi-join shape that scales. Registered at "
    "its n_planes = 0 EXACT DEGENERATION (zero sign bits -> one bucket "
    "-> the candidate set is every pair), where the full LSH machinery "
    "(posexplode bucketing, (table, bucket) equi-join, candidate dedup, "
    "rescore, rank) is provably EQUAL to the exact s01 top-k — so the "
    "oracle is the s01 SQL and the driver check gates the operator "
    "exactly, no fake precision. The PRUNED path (6 planes x 4 tables) "
    "keeps its recall + plan-shape gates in tests/test_llm_ops.py.",
)
def s04_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh(
        emb.filter(F.col("vec_id") < 20), emb, k=10, n_planes=0, n_tables=1
    )


@register(
    "s05_cosine_near_dup_lsh",
    _S03_SQL,
    doc="embedding-cosine near-dup pairs, bucketed DEFAULT path "
    "(operators/similarity.cosine_near_dup_pairs): sign-LSH candidate "
    "equi-join + exact rescore, no crossJoin anywhere in the plan. "
    "Registered at its n_planes = 0 EXACT DEGENERATION (one bucket -> "
    "every pair is a candidate), where the bucketed pipeline is provably "
    "EQUAL to the exact s03 pair set — the driver check gates the "
    "operator with the s03 oracle. Precision is exact at ANY "
    "parameterization; recall of the pruned 3x8 path vs the s03 verifier "
    "stays asserted in tests/test_llm_ops.py.",
)
def s05_cosine_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_near_dup_pairs(
        load(spark, sf_dir, "embeddings"),
        threshold=0.4,
        n_planes=0,
        n_tables=1,
    )


@register(
    "s06_ivf_topk",
    f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos
      FROM q, embeddings c WHERE q.vec_id != c.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    doc="IVF top-k served FROM THE PERSISTENT INDEX STORE "
    "(store.write_ivf_index + ivf_topk_from_store; built once per "
    "corpus version via plans/index_cache.ensure_ann_index — the d15 "
    "band-index pattern): the probe reads only the probed cells' "
    "partitions of the stored inverted file and rescores exact cosine "
    "there; training and assignment happened at write time. Registered "
    "at its nprobe = n_cells degeneration, where probing every cell "
    "makes IVF provably EQUAL to the exact brute-force top-k — so the "
    "oracle is the s01 SQL and the driver check exercises the full "
    "build+store+probe machinery with an exact gate, no fake "
    "precision. The PRUNED path (nprobe=4/16) keeps its recall + "
    "plan-shape gates in tests/test_llm_ops.py; the "
    "probe-never-rebuilds pin is in tests/test_index_store.py.",
)
def s06_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark import store
    from liq_stream_spark.plans.index_cache import ensure_ann_index

    emb = load(spark, sf_dir, "embeddings")
    path = ensure_ann_index(spark, emb, sf_dir, n_cells=16, m=16)
    return store.ivf_topk_from_store(
        spark, emb.filter(F.col("vec_id") < 20), path, k=10, nprobe=16
    )


# ---------------------------------------------------------------------------
# composite pipeline
# ---------------------------------------------------------------------------


def _p01_oracle() -> str:
    return f"""
    WITH qual AS ({_T01_SQL}),
    lang AS ({_duck_lang_sql()}),
    kept AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN qual USING (doc_id)
      JOIN lang USING (doc_id)
      WHERE qual.quality_score >= 3 AND lang.pred_lang = 'en'
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text
    )
    SELECT doc_id,
           coalesce(len(regexp_extract_all(text, '{_BPE_RE_SQL}')), 0)::BIGINT
               AS n_bpe_tokens
    FROM canon
    """


@register(
    "p01_training_prep",
    _p01_oracle(),
    doc="end-to-end training-data prep: quality gate (score >= 3) -> "
    "language gate (en) -> exact dedup keep-min-id -> BPE pretoken budget "
    "per surviving doc. The composition every stage of which is an "
    "operator above — narrow projections + one dedup shuffle; the whole "
    "chain stays oracle-exact.",
)
def p01_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    kept = (
        docs.join(
            X.quality_features(docs).select("doc_id", "quality_score"),
            "doc_id",
        )
        .join(X.lang_id(docs).select("doc_id", "pred_lang"), "doc_id")
        .filter((F.col("quality_score") >= 3) & (F.col("pred_lang") == "en"))
    )
    canon = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return canon.select(
        "doc_id", X.bpe_token_count("text").alias("n_bpe_tokens")
    )


_M01_SQL = """
    WITH a AS (
      SELECT i AS asset_id,
             CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST(16 + (i % 8) * 4 AS INTEGER) AS width,
             CAST(12 + (i % 5) * 4 AS INTEGER) AS height,
             -- the exact synth_assets byte stream as a VARCHAR: the FAKE
             -- header's <I fields are single-byte codepoints + NULs, the
             -- body is the ASCII hexdigest of '7:<i>' repeated to 768 B
             'FAKE' || chr(CAST(16 + (i % 8) * 4 AS INTEGER))
                    || chr(0) || chr(0) || chr(0)
                    || chr(CAST(12 + (i % 5) * 4 AS INTEGER))
                    || chr(0) || chr(0) || chr(0)
                    || repeat(sha256('7:' || i), 12) AS content
      FROM (SELECT unnest(range(48)) AS i)
    ),
    dig AS (
      SELECT asset_id, sha256(content) AS dg,
             strlen(content) AS n_bytes
      FROM a
    ),
    vec AS (
      -- image_features: the first 16 little-endian uint16 of the content
      -- digest, /65535 - 0.5, stored float32 (hence the REAL round-trip)
      SELECT asset_id,
             list_transform(range(0, 16), j ->
               CAST(CAST(('0x' || substr(dg, CAST(4*j+3 AS INTEGER), 2)
                                || substr(dg, CAST(4*j+1 AS INTEGER), 2)
                         )::BIGINT / 65535.0 - 0.5 AS REAL) AS DOUBLE)) AS v
      FROM dig
    ),
    nn AS (
      SELECT x.asset_id, y.asset_id AS nearest_asset_id,
             row_number() OVER (PARTITION BY x.asset_id
                 ORDER BY list_cosine_similarity(x.v, y.v) DESC,
                          y.asset_id) AS rn
      FROM vec x JOIN vec y ON x.asset_id != y.asset_id
    )
    SELECT a.asset_id, a.modality, 'fake' AS format, a.width, a.height,
           CAST(d.n_bytes AS BIGINT) AS n_bytes, d.dg AS content_sha256,
           nn.nearest_asset_id
    FROM a JOIN dig d USING (asset_id) JOIN nn USING (asset_id)
    WHERE nn.rn = 1
    """


@register(
    "m01_multimodal_pipeline",
    _M01_SQL,
    doc="multimodal pipeline drive: deterministic synthetic assets "
    "(binary + typed meta) -> mapInPandas decode (format/dims/bytes/"
    "sha256) -> feature extraction -> JVM-side cosine top-1 neighbor per "
    "asset (operators/multimodal.py feeding operators/similarity.py). "
    "FULLY ORACLED since the synth bodies went ASCII: DuckDB rebuilds "
    "the exact byte stream as a VARCHAR (NUL-safe), reproduces the "
    "binary sha256, the 16 x LE-uint16 feature extraction with its "
    "float32 storage round-trip, and the cosine nearest neighbor — so "
    "the whole binary->decode->embed->ANN chain is value-checked, not "
    "rows-only. The codec seam stays honest: a real deployment swaps "
    "PIL/ffmpeg into _decode_* and the oracle then gates only the "
    "plumbing-level columns.",
)
def m01_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from liq_stream_spark.operators import multimodal as M

    assets = M.synth_assets(spark, n=48)
    decoded = M.decode_images(assets).select(
        "asset_id",
        "modality",
        "format",
        "width",
        "height",
        "n_bytes",
        "content_sha256",
    )
    feats = M.image_features(assets).select(
        F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    nn = S.cosine_topk(feats, feats, k=1, id_col="vec_id").select(
        F.col("query_id").alias("asset_id"),
        F.col("neighbor_id").alias("nearest_asset_id"),
    )
    return decoded.join(nn, "asset_id")
