"""Corpus-preparation operators for LLM training-data pipelines
(SURVEY.md §2.8 extensions): sequence packing, overlapping chunking,
PII redaction, and C4-style line-level cleaning.

Everything is pure Column expressions (JVM-side, whole-stage codegen) and
oracle-checkable: integer token counts, deterministic md5 ordering, and
regexes written to run identically under Java regex (Spark) and RE2
(DuckDB) — no lookarounds, no backreferences.

Scale notes (100 TB):
- ``pack_offsets`` is the GPT-style concat-then-chunk packing map. The
  global prefix sum is computed DISTRIBUTED: docs land in 256 md5 buckets,
  the running total inside each bucket is a per-bucket window (parallel),
  and bucket base offsets come from a 256-row cumulative join — no single
  global sort/window task anywhere, so one hot partition never serializes
  the corpus.
- ``doc_chunks`` is a per-row explode — narrow, shuffle-free.
- ``pii_redact`` / ``quality_line_filter`` are per-row projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from liq_stream_spark.operators.text import bpe_token_count, tokens

# ---------------------------------------------------------------------------
# sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------

_PACK_BUCKETS = 256


def _order_hash(id_col: str, salt: str) -> Column:
    """Deterministic shuffle key: first 15 hex digits of md5(salt || id)
    (15, not 16, so the value stays within signed-long range — matching
    the DuckDB oracle). Pure function of (salt, id) — stable under
    repartitioning and corpus growth, reproducible in DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def pack_offsets(
    docs: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack-v1",
) -> DataFrame:
    """GPT-style sequence-packing map: documents are concatenated in a
    deterministic pseudo-random order (md5 shuffle) and the token stream is
    cut into fixed ``context_len`` windows; each doc reports where its
    tokens land.

    Output: (doc_id, n_tokens, start_offset, first_chunk, last_chunk) —
    all exact integers, so the whole packing plan is DuckDB-oracled.
    Zero-token docs occupy no space: they report their start offset and
    first_chunk = last_chunk = the chunk that offset falls in.

    The prefix sum is distributed: 256 md5 buckets -> per-bucket running
    totals (parallel windows) + a 256-row bucket-offset join. No global
    single-partition window; the same construction (same bucket function)
    runs in the DuckDB oracle, so results are bit-identical."""
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    h = _order_hash(id_col, salt)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        bpe_token_count(text_col).alias("n_tokens"),
        h.alias("__h"),
    ).withColumn("__b", F.col("__h") % _PACK_BUCKETS)

    # per-bucket running total in (hash, doc_id) order — parallel windows
    wb = W.partitionBy("__b").orderBy("__h", "doc_id")
    local = base.withColumn(
        "__local_end", F.sum("n_tokens").over(wb)
    )

    # bucket base offsets: cumulative sum over the 256 bucket totals
    totals = base.groupBy("__b").agg(F.sum("n_tokens").alias("__tot"))
    wo = W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__tot").over(wo), F.lit(0)).alias("__base")
    )

    out = local.join(F.broadcast(offsets), "__b").select(
        "doc_id",
        "n_tokens",
        (F.col("__base") + F.col("__local_end") - F.col("n_tokens")).alias(
            "start_offset"
        ),
    )
    start = F.col("start_offset")
    end = start + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return out.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(start / context_len).cast("long").alias("first_chunk"),
        F.floor(end / context_len).cast("long").alias("last_chunk"),
    )


# ---------------------------------------------------------------------------
# overlapping token-window chunking
# ---------------------------------------------------------------------------


def doc_chunks(
    docs: DataFrame,
    chunk_tokens: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping whitespace-token windows —
    the retrieval/embedding chunking shape (e.g. 128-token chunks, stride
    96 = 32-token overlap).

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens; the
    final chunk may be short. Empty docs produce no chunks. Output:
    (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_text). Per-row
    sequence/slice + explode: narrow, shuffle-free, codegen'd."""
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # explicit guard: sequence(0, -1) would be a DESCENDING 2-element array
    starts = F.when(F.col("__n") <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    )
    exploded = base.select(
        "doc_id",
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_start") + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-safe (no lookarounds); identical semantics in Java regex.
# Order matters: emails first (an email contains dots/digits that the
# phone pattern must not see), then IPv4, then phone-like digit runs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# + optional country code, then 9..14 digits with -/space/./() separators:
# matches 555-123-4567, +1 (212) 555 0199; won't match short ids like 1234
PII_PHONE_RE = r"\+?\d[\d().\- ]{7,14}\d\b"


def pii_redact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-like digit runs, replacing
    each with a typed tag. Output: (doc_id, redacted_text, n_emails,
    n_ips, n_phones) — counts taken BEFORE replacement, sequentially (the
    phone counter runs on email/IP-redacted text so an email's digits are
    never double-counted as a phone).

    Per-row regexp projection, zero shuffle; the same RE2-safe patterns
    run in the DuckDB oracle."""
    t0 = F.col(text_col)
    n_emails = F.coalesce(F.regexp_count(t0, F.lit(PII_EMAIL_RE)), F.lit(0))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.coalesce(F.regexp_count(t1, F.lit(PII_IPV4_RE)), F.lit(0))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phones = F.coalesce(F.regexp_count(t2, F.lit(PII_PHONE_RE)), F.lit(0))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        t3.alias("redacted_text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# C4-style line-level cleaning
# ---------------------------------------------------------------------------

_TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def quality_line_filter(
    docs: DataFrame,
    min_words: int = 3,
    require_terminal_punct: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line filtering: split on newlines, keep lines with at
    least ``min_words`` whitespace words, no curly braces (code/templating
    markers), not containing "lorem ipsum" or "javascript" (case-
    insensitive), and — when ``require_terminal_punct`` — ending in
    terminal punctuation. Kept lines are rejoined with newlines.

    Output: (doc_id, n_lines, n_kept_lines, clean_text). Pure higher-order
    filter over the line array, per-row, shuffle-free."""
    lines = F.split(F.col(text_col), "\n")

    def _keep(ln: Column) -> Column:
        trimmed = F.trim(ln)
        words = F.size(F.filter(F.split(trimmed, r"\s+"), lambda w: w != ""))
        low = F.lower(trimmed)
        ok = (
            (words >= min_words)
            & ~low.contains("{")
            & ~low.contains("}")
            & ~low.contains("lorem ipsum")
            & ~low.contains("javascript")
        )
        if require_terminal_punct:
            term = None
            for p in _TERMINAL_PUNCT:
                cond = trimmed.endswith(p)
                term = cond if term is None else (term | cond)
            ok = ok & term
        return ok

    kept = F.filter(lines, _keep)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def temperature_mix(
    docs: DataFrame,
    budget_frac: float = 0.5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp-mix-v1",
) -> DataFrame:
    """Temperature-based multilingual mixing (the UniMax/temperature-
    sampling move, T=2 i.e. weight ∝ sqrt(count)): DERIVE each stratum's
    sampling rate from corpus statistics instead of hand-picking rates
    (the p04 stratified sampler takes the rates as given; this computes
    them). Square-root weighting upsamples tail languages relative to
    their corpus share while keeping head languages dominant — the
    standard compromise between proportional (head-only) and uniform
    (tail-noise) mixing.

    Determinism across engines: per-stratum weights are sqrt(count)
    rounded to 9 dp and summed as DECIMAL(25,9) (order-free), shares and
    rates then divide as doubles (IEEE-exact given identical inputs),
    and membership is the same md5-bucket rule as hash_split — a pure
    function of (salt, id), stable under repartition and corpus growth.

    Output per stratum: (stratum, n_corpus_docs, rate_bp, n_kept_docs).
    Scale shape: one tiny per-stratum agg, a broadcast rates join, one
    narrow filter pass — the corpus never shuffles."""
    from liq_stream_spark.operators.text import SPLIT_MOD, md5_bucket

    counts = docs.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_corpus_docs")
    )
    weights = counts.withColumn(
        "w", F.round(F.sqrt(F.col("n_corpus_docs")), 9)
    )
    tot = weights.agg(
        F.sum(F.col("w").cast("decimal(25,9)")).alias("w_sum"),
        F.sum("n_corpus_docs").alias("n_total"),
    )
    rates = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn(
            "share",
            F.col("w").cast("double") / F.col("w_sum").cast("double"),
        )
        .withColumn(
            "target",
            F.floor(
                F.col("share")
                * F.floor(F.col("n_total") * F.lit(budget_frac))
            ),
        )
        .withColumn(
            "rate_bp",
            F.least(
                F.floor(
                    F.col("target")
                    / F.col("n_corpus_docs")
                    * F.lit(SPLIT_MOD)
                ),
                F.lit(SPLIT_MOD),
            ).cast("long"),
        )
        .select(strata_col, "n_corpus_docs", "rate_bp")
    )
    kept = (
        docs.select(strata_col, md5_bucket(id_col, salt).alias("__bkt"))
        .join(F.broadcast(rates), strata_col)
        .filter(F.col("__bkt") < F.col("rate_bp"))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_kept_docs"))
    )
    return rates.join(kept, strata_col, "left").select(
        strata_col,
        "n_corpus_docs",
        "rate_bp",
        F.coalesce("n_kept_docs", F.lit(0)).cast("long").alias("n_kept_docs"),
    )
