"""Property-based tests (hypothesis) for the subtle per-row semantics
(SURVEY.md §5.4, §7.4): truthiness coalescing, the seconds/ms/ISO
timestamp heuristic, and normalization never throwing on arbitrary
venue-shaped payloads.

Strategy: generate values in PYTHON, compute the reference semantics in
Python (the spec), and run the Spark expression over the same values in
one batch — one Spark job per property, not per example.
"""

from __future__ import annotations

import json
import re
import math

from hypothesis import given, settings, strategies as st

from liq_stream_spark.functions import to_ms, truthy_double
from liq_stream_spark.operators import normalize_binance

# ---------------------------------------------------------------------------
# reference implementations (the spec, transcribed from the survey)
# ---------------------------------------------------------------------------


def ref_truthy_float(*vals):
    """float(a or b or ... or 0.0) with float() failure -> None (skip)."""
    chosen = None
    for v in vals:
        if v:
            chosen = v
            break
    if chosen is None:
        chosen = 0.0
    try:
        return float(chosen)
    except (TypeError, ValueError):
        return None


def ref_to_ms(ts):
    if ts is None:
        return None
    try:
        v = float(ts)
        if math.isnan(v) or math.isinf(v):
            return None
        return int(v * 1000) if v < 1e12 else int(v)
    except (TypeError, ValueError):
        pass
    try:
        from datetime import datetime, timezone

        s = str(ts).rstrip("Z")
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)  # container TZ is UTC
        return int(dt.timestamp() * 1000)
    except (TypeError, ValueError):
        return None


# ---------------------------------------------------------------------------

wire_numbers = st.one_of(
    st.none(),
    st.just(""),
    st.sampled_from(["0", "0.0", "-0", "00.5"]),
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ).map(lambda f: f"{f!r}"),
    st.integers(min_value=0, max_value=10**15).map(str),
    st.sampled_from(["abc", " 1", "1_0", "1e3", "NaN", "inf"]),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(wire_numbers, wire_numbers), min_size=1, max_size=40))
def test_truthy_double_matches_python_or_chain(spark, pairs):
    expected = [ref_truthy_float(a, b) for a, b in pairs]
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a string, b string"
    )
    from pyspark.sql import functions as F

    got = [
        r["x"]
        for r in df.select(
            # bare strings are column names; literals must be F.lit
            truthy_double("a", "b", F.lit("0.0")).alias("x")
        ).collect()
    ]
    def chosen(a, b):
        return a if a else (b if b else "0.0")

    for (a, b), e, g in zip(pairs, expected, got):
        c = chosen(a, b)
        if e is None:
            # Python float() raised -> reference skips the row; Spark
            # signals the same with NULL (callers drop or default)
            assert g is None, (a, b, g)
        elif "_" in c or c.lower() in ("nan", "inf", "-inf", "infinity"):
            # documented deviations: Python parses underscore literals and
            # nan/inf words; SQL try_cast doesn't (wire feeds never send
            # these). Spark yields NULL -> row skipped instead of kept.
            assert g is None or g == e or math.isnan(e), (a, b, e, g)
        else:
            assert g == e, (a, b, e, g)


ts_values = st.one_of(
    st.none(),
    st.just(""),
    st.integers(min_value=0, max_value=3 * 10**12).map(str),
    st.integers(min_value=0, max_value=2 * 10**9).map(str),   # seconds range
    st.floats(min_value=0, max_value=2e12, allow_nan=False,
              allow_infinity=False).map(lambda f: f"{f:.3f}"),
    st.datetimes(
        min_value=__import__("datetime").datetime(1990, 1, 1),
        max_value=__import__("datetime").datetime(2100, 1, 1),
    ).map(lambda d: d.isoformat() + "Z"),
    st.sampled_from(["not a ts", "2025-13-45T99:99:99"]),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(ts_values, min_size=1, max_size=40))
def test_to_ms_matches_reference_heuristic(spark, values):
    expected = [ref_to_ms(v) for v in values]
    df = spark.createDataFrame([(v,) for v in values], "ts string")
    got = [r["ms"] for r in df.select(to_ms("ts").alias("ms")).collect()]
    for v, e, g in zip(values, expected, got):
        assert g == e, (v, e, g)


order_fields = st.fixed_dictionaries(
    {},
    optional={
        "s": st.sampled_from(["BTCUSDT", "", "X"]),
        "S": st.sampled_from(["BUY", "SELL", "buy", "HOLD", ""]),
        "q": wire_numbers,
        "p": wire_numbers,
        "ap": wire_numbers,
        "l": wire_numbers,
        "z": wire_numbers,
        "T": st.integers(min_value=0, max_value=2**40),
    },
)

frames = st.one_of(
    st.fixed_dictionaries(
        {}, optional={
            "e": st.just("forceOrder"),
            "E": st.integers(min_value=0, max_value=2**40),
            "o": order_fields,
        }
    ),
    st.lists(
        st.fixed_dictionaries(
            {}, optional={
                "E": st.integers(min_value=0, max_value=2**40),
                "o": order_fields,
            }
        ),
        max_size=3,
    ),
    st.just("ping"),
    st.just("{not json"),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(frames, min_size=1, max_size=10))
def test_normalize_binance_never_throws_and_invariants(spark, frame_list):
    lines = [
        (f if isinstance(f, str) else json.dumps(f),) for f in frame_list
    ]
    df = spark.createDataFrame(lines, "value string").withColumn(
        "ts_ingest_ms", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1)
    )
    rows = normalize_binance(df).collect()
    for r in rows:
        assert r["side"] in ("long", "short", None)
        assert r["exchange"] == "binance" and r["market"] == "usdt"
        # notional invariant (N16): price*qty when both truthy, else NULL
        # (NaN wire values propagate — float('NaN') is truthy in the
        # reference too, so a NaN notional is faithful behavior)
        if r["notional"] is not None:
            assert r["price"] and r["qty"]
            prod = r["price"] * r["qty"]
            assert r["notional"] == prod or (
                math.isnan(r["notional"]) and math.isnan(prod)
            )
        else:
            assert not r["price"] or not r["qty"]
        assert r["qty"] is not None and r["price"] is not None


# ---------------------------------------------------------------------------
# bybit legacy channel: arbitrary legacy-shaped frames never throw, and the
# per-row semantics hold (µs→ms, drop on present-but-unparsable
# updatedTimeE6, "" side, 0.0 qty/price/notional floors)
# ---------------------------------------------------------------------------

legacy_rows = st.fixed_dictionaries(
    {},
    optional={
        "updatedTimeE6": st.one_of(
            st.integers(min_value=0, max_value=2**52),
            st.sampled_from(["1739502302929000", "", "oops", "12.5"]),
        ),
        "symbol": st.sampled_from(["BTCUSDT", "ETHUSDT", ""]),
        "side": st.sampled_from(["Buy", "Sell", "buy", "HOLD", ""]),
        "size": st.sampled_from(["1", "2.5", "", "bogus"]),
        "price": st.sampled_from(["10", "0", "", "nah"]),
    },
)

legacy_frames = st.fixed_dictionaries(
    {"topic": st.just("liquidation.X")},
    optional={
        "ts": st.integers(min_value=0, max_value=2**40),
        "data": st.one_of(legacy_rows, st.lists(legacy_rows, max_size=3)),
    },
)


@settings(max_examples=20, deadline=None)
@given(st.lists(legacy_frames, min_size=1, max_size=8))
def test_normalize_bybit_legacy_never_throws_and_invariants(spark, frame_list):
    from pyspark.sql import functions as F

    from liq_stream_spark.operators import normalize_bybit

    lines = [(json.dumps(f),) for f in frame_list]
    df = spark.createDataFrame(lines, "value string").withColumn(
        "ts_ingest_ms", F.lit(1)
    )
    rows = normalize_bybit(df).collect()

    # reference spec over the same frames (bybit_adapter.py:145-227)
    expected = []
    for f in frame_list:
        data = f.get("data")
        if data is None:
            continue
        for liq in data if isinstance(data, list) else [data]:
            try:
                qty = ref_truthy_float(liq.get("size"), 0) or 0.0
                price = ref_truthy_float(liq.get("price"), 0) or 0.0
            except Exception:
                qty, price = 0.0, 0.0
            if qty is None:
                qty = 0.0
            if price is None:
                price = 0.0
            ts = None
            try:
                if liq.get("updatedTimeE6") is not None:
                    ts = int(int(liq["updatedTimeE6"]) / 1000)
                elif f.get("ts") is not None:
                    ts = int(f["ts"])
            except Exception:
                continue  # int() raised -> row dropped
            side_raw = (liq.get("side") or "").lower()
            side = (
                "short" if side_raw == "buy"
                else "long" if side_raw == "sell" else ""
            )
            expected.append(
                (
                    liq.get("symbol") or "",
                    side,
                    qty,
                    price,
                    price * qty if price and qty else 0.0,
                    ts,
                )
            )
    def _none_safe(t):  # ts may be NULL on some rows; None < any int
        return tuple((v is not None, v) for v in t)

    got = sorted(
        (
            (r["symbol"], r["side"], r["qty"], r["price"], r["notional"],
             r["ts_exch_ms"])
            for r in rows
        ),
        key=_none_safe,
    )
    assert got == sorted(expected, key=_none_safe)


# ---------------------------------------------------------------------------
# corpus-hygiene operators vs pure-Python specs
# ---------------------------------------------------------------------------


def ref_ws_tokens(text):
    # the ENGINE spec, identical in Spark and the DuckDB oracle: trim
    # removes SPACES only (not \t\n), and regex-split keeps empty edge
    # tokens produced by leading/trailing non-space whitespace
    t = text.strip(" ")
    if t == "":
        return []
    return re.split(r"\s+", t)


def ref_repetition(text):
    toks = ref_ws_tokens(text)
    n = len(toks)
    if n == 0:
        return (0, 0, 0.0, 0.0)
    from collections import Counter

    tc = Counter(toks)
    top_frac = max(tc.values()) / n
    grams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
    if not grams:
        return (n, len(tc), top_frac, 0.0)
    gc = Counter(grams)
    dup = sum(c for c in gc.values() if c > 1)
    return (n, len(tc), top_frac, dup / len(grams))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab xy\t\n"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_repetition_signals_match_python_spec(spark, texts):
    from liq_stream_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_distinct_tokens"],
            r["top_token_frac"],
            r["dup_2gram_frac"],
        )
        for r in repetition_signals(df).collect()
    }
    for i, text in enumerate(texts):
        exp = ref_repetition(text)
        assert got[i][0] == exp[0], (i, text)
        assert got[i][1] == exp[1], (i, text)
        assert abs(got[i][2] - exp[2]) < 1e-12, (i, text)
        assert abs(got[i][3] - exp[3]) < 1e-12, (i, text)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=0, max_size=30),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_token_ngrams_match_python_spec(spark, texts, n):
    from liq_stream_spark.operators.text import token_ngrams_of_text

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", token_ngrams_of_text("text", n).alias("g")
        ).collect()
    }
    for i, text in enumerate(texts):
        toks = ref_ws_tokens(text)
        exp = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ]
        assert got[i] == exp, (i, text, n)


# ---------------------------------------------------------------------------
# corpus shaping vs pure-Python specs
# ---------------------------------------------------------------------------


def ref_bpe_count(text):
    # lookahead-free GPT-2-style pretokens (operators/text.BPE_PRETOKEN_RE),
    # ASCII form: explicit classes so '_' lands in the punct run exactly as
    # Java's [^\s\p{L}\p{N}] puts it there (python \w would claim it)
    return len(
        re.findall(
            r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+",
            text,
        )
    )


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        # ASCII only: the python spec below and Java regex agree there;
        # Unicode-class drift across engine Unicode versions is t05's
        # cross-engine oracle's job, not this packing-arithmetic spec's
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=64),
)
def test_pack_offsets_matches_python_concat_spec(spark, texts, ctx):
    """pack_offsets == naive spec: sort docs by (md5-hash, id), walk the
    running token total. The distributed 256-bucket prefix sum must be
    indistinguishable from the sequential walk."""
    import hashlib

    from liq_stream_spark.operators.corpus import pack_offsets
    from liq_stream_spark.operators.text import bpe_token_count  # noqa: F401

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_chunk"], r["last_chunk"]
        )
        for r in pack_offsets(df, ctx).collect()
    }

    def h(i):
        return int(
            hashlib.md5(f"pack-v1:{i}".encode()).hexdigest()[:15], 16
        )

    # spark counts pretokens with Java \p{L}/\p{N}; the python spec below
    # matches for this alphabet (letters/digits/punct/space only)
    order = sorted(rows, key=lambda r: (h(r[0]) % 256, h(r[0]), r[0]))
    pos = 0
    want = {}
    for i, t in order:
        n = ref_bpe_count(t)
        end = pos + max(n - 1, 0)
        want[i] = (n, pos, pos // ctx, end // ctx)
        pos += n
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    # ASCII only: engine \s is ASCII whitespace; python's is Unicode-wide
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=80,
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_doc_chunks_match_python_spec(spark, text, chunk, stride):
    from liq_stream_spark.operators.corpus import doc_chunks

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in doc_chunks(df, chunk, stride).collect()
    )
    toks = ref_ws_tokens(text)
    want = sorted(
        (
            s // stride,
            s,
            len(toks[s : s + chunk]),
            " ".join(toks[s : s + chunk]),
        )
        for s in range(0, len(toks), stride)
    )
    assert got == want


# ---------------------------------------------------------------------------
# duplicate-span removal (d13) vs a transparent Python reference
# ---------------------------------------------------------------------------


def ref_span_removal(texts: list[str], n: int):
    """Sequential spec: tokenize on whitespace (trim spaces only), find
    n-grams occurring in >= 2 distinct docs, cover every occurrence's
    span, rebuild from uncovered tokens."""
    import re as _re

    def toks(t):
        t = t.strip(" ")
        return [] if t == "" else _re.split(r"\s+", t, flags=_re.ASCII)

    all_toks = [toks(t) for t in texts]
    gram_docs: dict[tuple, set] = {}
    for d, T in enumerate(all_toks):
        for i in range(len(T) - n + 1):
            gram_docs.setdefault(tuple(T[i : i + n]), set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    out = []
    for d, T in enumerate(all_toks):
        cov = set()
        for i in range(len(T) - n + 1):
            if tuple(T[i : i + n]) in dup:
                cov.update(range(i, i + n))
        kept = [tok for i, tok in enumerate(T) if i not in cov]
        out.append((len(T), len(cov), " ".join(kept)))
    return out


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("a b c d e".split()), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_duplicate_span_removal_matches_python_spec(spark, texts, n):
    from liq_stream_spark.operators.dedup import duplicate_span_removal

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["cleaned_text"])
        for r in duplicate_span_removal(df, n=n).collect()
    }
    expected = dict(enumerate(ref_span_removal(texts, n)))
    assert got == expected


# ---------------------------------------------------------------------------
# BPE merge-pair stats (t11) vs a transparent Python reference
# ---------------------------------------------------------------------------


def ref_bpe_merge_pairs(texts: list[str], k: int):
    """Sequential spec on ASCII inputs (where Java's \\p{L}/\\p{N} equal
    [A-Za-z]/[0-9]): pretokenize GPT-style, count distinct pretokens,
    weight each adjacent char pair by its pretoken's count, take top-k
    by (count desc, pair asc)."""
    import re as _re
    from collections import Counter

    pre_re = _re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
    )
    cnt = Counter(tok for t in texts for tok in pre_re.findall(t))
    pairs = Counter()
    for tok, c in cnt.items():
        for i in range(len(tok) - 1):
            pairs[tok[i : i + 2]] += c
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (rank + 1, pair, n) for rank, (pair, n) in enumerate(ranked)
    ]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab1 .'stx",  # letters, digit, space, punct, 's suffix
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=20),
)
def test_bpe_merge_pairs_match_python_spec(spark, texts, k):
    from liq_stream_spark.operators.text import bpe_merge_pair_stats

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r["rank"], r["pair"], r["n_occurrences"])
        for r in bpe_merge_pair_stats(df, k=k)
        .orderBy("rank")
        .collect()
    ]
    assert got == ref_bpe_merge_pairs(texts, k)


# ---------------------------------------------------------------------------
# winnowing fingerprints (t12) vs a transparent Python reference
# ---------------------------------------------------------------------------


def ref_winnow(texts: list[str], n: int, w: int):
    """Sequential spec: base-131 char n-gram hashes mod 2^32, min of each
    length-w window (short docs: one window over what exists), distinct."""
    out = {}
    for d, t in enumerate(texts):
        hs = [
            sum(ord(t[i + j]) * 131 ** (n - 1 - j) for j in range(n))
            % 4294967296
            for i in range(max(len(t) - n + 1, 0))
        ]
        if not hs:
            continue
        fps = {
            min(hs[i : i + w]) for i in range(max(len(hs) - w, 0) + 1)
        }
        out[d] = fps
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcab ", min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_winnow_fingerprints_match_python_spec(spark, texts, w):
    from liq_stream_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict = {}
    for r in winnow_fingerprints(df, ngram=3, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got == ref_winnow(texts, 3, w)


# ---------------------------------------------------------------------------
# round-6 quality models vs pure-Python specs
# ---------------------------------------------------------------------------


def ref_entropy(text):
    """unigram_entropy's exact quantized recurrence in plain Python."""
    toks = ref_ws_tokens(text)
    n = len(toks)
    if n == 0:
        return (0, 0, None)
    from collections import Counter

    tc = Counter(toks)
    klnk_micro = sum(
        k * math.floor(math.log(float(k)) * 1e6 + 0.5) for k in tc.values()
    )
    h = math.log(float(n)) - klnk_micro / (n * 1e6)
    return (n, len(tc), math.floor(h * 1e6 + 0.5) / 1e6)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abc xy\t"), min_size=0, max_size=50),
        min_size=1,
        max_size=15,
    )
)
def test_unigram_entropy_matches_python_spec(spark, texts):
    from liq_stream_spark.operators.text import unigram_entropy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["entropy"])
        for r in unigram_entropy(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_entropy(t), f"text={t!r}"


def ref_hashed_score(text):
    """hashed_linear_score's exact recurrence: md5-bucket weights,
    BIGINT dot, raw IEEE margin, 1e-6-floored sigmoid."""
    import hashlib

    toks = ref_ws_tokens(text)
    if not toks:
        return (0, None, None)

    def md5mod(key, mod):
        return int(hashlib.md5(f"qw-v1:{key}".encode()).hexdigest()[:8], 16) % mod

    dot = sum(md5mod(str(md5mod(w.lower(), 1024)), 2001) - 1000 for w in toks)
    n = len(toks)
    margin = dot / (1000.0 * n)
    prob = math.floor(1.0 / (1.0 + math.exp(-margin)) * 1e6 + 0.5) / 1e6
    return (n, margin, prob)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abC d e\t"), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
def test_hashed_linear_score_matches_python_spec(spark, texts):
    from liq_stream_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["margin"], r["prob"])
        for r in hashed_linear_score(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_hashed_score(t), f"text={t!r}"
