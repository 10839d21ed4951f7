"""Driver-session shim over the persistent ANN index store (r8).

IVF/PQ are offline-build / online-probe structures (see ivf_topk /
pq_topk docstrings; FAISS's train-add-search split): a production
deployment builds the index once per corpus version and serves every
query batch from it. r7 memoized the deterministic builds in-process;
r8 completes the story by PERSISTING them through liq_stream_spark.store
(write_ivf_index / write_pq_index — the d15 band-index pattern), so the
build is paid once per CORPUS VERSION, not once per process, and the
registered s06/s07/s08/s09 queries probe the stored index exactly like
a production serving path would.

Three layers, all correctness-neutral:

- disk: parquet under ``$LIQ_ANN_STORE`` (default
  ``<repo>/spark-warehouse/ann_index`` — per-checkout, never a
  world-shared /tmp path), keyed by a BUILDER VERSION + build params +
  a CORPUS FINGERPRINT (size+mtime of every file under the embeddings
  table — ADVICE r7: a regenerated fixture must never serve a stale
  index; the version salt protects the store, which outlives the
  checkout, from silently serving rows built by an older algorithm).
  Writes build into a tmp dir and atomically rename, so readers only
  ever see complete indexes.
- process: collected rows of the tiny centroid/codebook frames
  (16-256 rows), re-created into a fresh DataFrame per call so no
  plan leaks across sessions.
- oracle: the DuckDB oracles re-derive the same index from scratch
  inside their own SQL every run, so the driver's value gate still
  exercises the full build+probe semantics end-to-end.

The builds are deterministic (seeds = smallest-id vectors, fixed
iteration count) and parquet round-trips IEEE doubles exactly, so
stored rows are bit-identical to a rebuild (pinned in
tests/test_llm_ops.py::test_index_cache_rows_match_direct_build).

GUARD (ADVICE r7): every entry point asserts the corpus frame is a bare
scan of ``{sf_dir}/embeddings.parquet`` — a filtered/joined frame or a
different table raises instead of poisoning the cache for later callers
(tests/test_index_store.py).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CENTROID_SCHEMA = "cell long, centroid array<double>"
_CODEBOOK_SCHEMA = "s int, code long, centroid array<double>"

# Builder-algorithm version, folded into every disk key (r8 review): the
# store OUTLIVES the checkout, so an algorithm change (new seeding, new
# argmax form — r7 rewrote one) with unchanged params+fingerprint would
# otherwise serve rows built by the OLD code. r9: the constant moved to
# liq_stream_spark.store (one source of truth — the store stamps it
# into every index's meta sidecar and append_to_ivf_index refuses
# cross-version appends); same "v1" value, so existing disk keys stay
# valid.
from liq_stream_spark.store import BUILDER_VERSION as _BUILDER_VERSION

_rows: dict[tuple, list] = {}
_counts: dict[tuple, int] = {}


def _store_root() -> str:
    """Default root lives under the repo's gitignored spark-warehouse —
    per-checkout, owned by the checkout's user (a fixed world-shared
    /tmp path invites cross-user EACCES collisions and, worse, lets any
    local user pre-plant parquet under a predictable key — r8 review).
    When the package is INSTALLED (no .git beside it — ``__file__``
    would point into site-packages, which is shared and often
    read-only), fall back to the per-user cache dir instead.
    $LIQ_ANN_STORE overrides for deployments with a real shared lake."""
    env = os.environ.get("LIQ_ANN_STORE")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    if os.path.isdir(os.path.join(repo, ".git")):
        return os.path.join(repo, "spark-warehouse", "ann_index")
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(cache, "liq_stream_spark", "ann_index")


def _file_salt(p: str, st: os.stat_result, h) -> None:
    """Content salt (ADVICE r8, defense in depth): fold the first and
    last 4 KiB of the file into the fingerprint, so a fixture rewritten
    with size AND mtime preserved (restore tools that keep timestamps)
    still changes the key. Parquet puts its footer metadata — row-group
    offsets, column stats — in the tail, so any real rewrite perturbs
    those bytes. 8 KiB per file of extra I/O, negligible next to the
    build it guards."""
    with open(p, "rb") as f:
        h.update(f.read(4096))
        if st.st_size > 4096:
            f.seek(max(4096, st.st_size - 4096))
            h.update(f.read(4096))


def _fingerprint(sf_dir: str, table_file: str = "embeddings.parquet") -> str:
    """Corpus-version fingerprint: sha1 over (relpath, size, mtime_ns)
    PLUS a head/tail content salt of every file under the source
    table. Computed fresh on every call so an in-place fixture rewrite
    is seen immediately — the stale-index hazard the r7 memo had; the
    salt closes the preserved-mtime corner (ADVICE r8)."""
    base = os.path.join(sf_dir, table_file)
    h = hashlib.sha1()
    if os.path.isfile(base):
        st = os.stat(base)
        h.update(f"f:{st.st_size}:{st.st_mtime_ns}".encode())
        _file_salt(base, st, h)
    else:
        for root, _dirs, files in sorted(os.walk(base)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                rel = os.path.relpath(p, base)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
                _file_salt(p, st, h)
    return h.hexdigest()[:16]


def _guard_bare_scan(
    frame: DataFrame, sf_dir: str, table_file: str, cols: tuple[str, ...]
) -> None:
    """Refuse any frame that is not the bare ``{sf_dir}/{table_file}``
    scan: the cache key is (sf_dir fingerprint, params), so a filtered
    or foreign frame through here would poison every later caller."""
    word = table_file.split(".")[0]
    expect = os.path.realpath(os.path.join(sf_dir, table_file))
    files = [
        os.path.realpath(f.removeprefix("file:"))
        for f in frame.inputFiles()
    ]
    # separator-bounded prefix: embeddings.parquet.bak must NOT pass
    ok = lambda f: f == expect or f.startswith(expect + os.sep)  # noqa: E731
    if not files or not all(ok(f) for f in files):
        raise ValueError(
            f"index cache requires the {word} table of {sf_dir}; "
            f"got a frame scanning {files[:3] or 'no files'}"
        )
    # STRUCTURAL check (VERDICT r8 item 5 / ADVICE r8): a bare
    # spark.read.parquet frame's analyzed plan is a single leaf relation
    # node; any Filter/Project/Join/Aggregate wraps it with children.
    # Testing leaf-ness is robust to node renames and to path/column
    # text containing node-name words, both of which broke the old
    # rendered-string substring match.
    plan = frame._jdf.queryExecution().analyzed()
    if not plan.children().isEmpty():
        raise ValueError(
            f"index cache requires a BARE scan of the {word} table "
            f"(the plan's top node is {plan.nodeName()}, not a leaf "
            "relation) — build indexes over derived frames with the "
            "operators directly"
        )
    if not set(cols) <= set(frame.columns):
        raise ValueError(
            f"frame lacks {'/'.join(cols)} columns: {frame.columns}"
        )


def _guard_corpus(corpus: DataFrame, sf_dir: str) -> None:
    _guard_bare_scan(
        corpus, sf_dir, "embeddings.parquet", ("vec_id", "embedding")
    )


def _disk_path(key: tuple) -> str:
    key = (_BUILDER_VERSION, *key)
    digest = hashlib.sha1(repr(key).encode()).hexdigest()[:16]
    return os.path.join(_store_root(), f"{key[1]}-{_BUILDER_VERSION}-{digest}")


# a dead-pid tmp must ALSO be this old before the sweep takes it: for
# legacy bare-pid tmp names the pid test runs in the SWEEPER'S pid
# namespace, so a live builder in another container/host sharing
# $LIQ_ANN_STORE can look dead here (r9 review). r10 tmp names carry a
# hostname+uuid token (store._swap_token), making same-host probes
# definitive; the grace costs nothing (no index build runs an hour).
_SWEEP_GRACE_SEC = 3600


def _sweep_orphan_tmps(root: str) -> None:
    """ADVICE r8: a build that crashes between the tmp write and
    _publish leaves '{key}.tmp.{token}' garbage in the store forever
    (publish stays atomic, so disk waste only). Deletion policy per
    store._token_probe (ADVICE r9 — the 24h arm no longer overrides a
    DEFINITIVE liveness answer): provably-dead creators after the grace
    hour, unprobeable ones (other host, legacy bare-pid beyond range)
    after a day, provably-alive ones NEVER — a same-host builder
    genuinely running long keeps its tmp; the uuid in r10 tokens means
    a recycled pid can at worst delay one orphan's sweep, never collide
    with a live build's name. Best-effort: a sweep racing a same-key
    builder's rename loses harmlessly (rmtree of a vanished path is
    ignored; the builder's _publish already tolerates a vanished tmp by
    failing the rename into the discard arm)."""
    import time

    from liq_stream_spark.store import _token_probe

    try:
        entries = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for name in entries:
        base, sep, token = name.rpartition(".tmp.")
        if not sep or not token:
            continue
        p = os.path.join(root, name)
        try:
            age = now - os.stat(p).st_mtime
        except OSError:
            continue  # already gone (concurrent sweep/publish)
        probe = _token_probe(token)
        if (probe == "dead" and age > _SWEEP_GRACE_SEC) or (
            probe == "unknown" and age > 86400
        ):
            shutil.rmtree(p, ignore_errors=True)


def _publish(tmp: str, dst: str) -> None:
    """Atomic publish: readers only ever see a complete index dir. A
    concurrent builder that lost the rename race discards its copy.
    Each publish also sweeps dead-pid/stale tmp orphans from the store
    (ADVICE r8) — crash garbage is bounded by one crashed build, not
    accumulated forever."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.rename(tmp, dst)
    except OSError:
        if not os.path.isdir(dst):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    _sweep_orphan_tmps(os.path.dirname(dst))


def _cached_frame(
    spark: SparkSession,
    key: tuple,
    schema: str,
    build,
    sort_key,
) -> DataFrame:
    """memo -> disk -> build+persist; returns a fresh driver-local frame
    of the (tiny) index rows either way."""
    if key not in _rows:
        disk = _disk_path(key)
        if os.path.isdir(disk):
            rows = spark.read.parquet(disk).collect()
        else:
            rows = build().collect()
            from liq_stream_spark.store import _swap_token

            tmp = f"{disk}.tmp.{_swap_token()}"
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            _publish(tmp, disk)
        # deterministic row order regardless of source (parquet read
        # order is partition-dependent)
        _rows[key] = sorted(rows, key=sort_key)
    return spark.createDataFrame(_rows[key], schema)


def cached_centroids(
    spark: SparkSession,
    corpus: DataFrame,
    sf_dir: str,
    n_cells: int,
    iters: int = 2,
    _fp: str | None = None,
) -> DataFrame:
    """``_fp``: a fingerprint the CALLER just computed for this sf_dir
    (ensure_ann_index passes it to its two training-half calls) — the
    salt made _fingerprint a real I/O walk, so one entry call should
    pay it once, not three times (r9 review). Per-entry-call freshness
    is preserved: every external entry point still stats the fixture
    itself."""
    _guard_corpus(corpus, sf_dir)
    key = ("ivf", _fp or _fingerprint(sf_dir), n_cells, iters)
    from liq_stream_spark.operators import similarity as S

    return _cached_frame(
        spark,
        key,
        _CENTROID_SCHEMA,
        lambda: S.kmeans_centroids(corpus, n_cells, iters),
        lambda r: r["cell"],
    )


def cached_codebooks(
    spark: SparkSession,
    corpus: DataFrame,
    sf_dir: str,
    m: int,
    n_codes: int = 16,
    iters: int = 2,
    _fp: str | None = None,
) -> DataFrame:
    _guard_corpus(corpus, sf_dir)
    key = ("pq", _fp or _fingerprint(sf_dir), m, n_codes, iters)
    from liq_stream_spark.operators import similarity as S

    return _cached_frame(
        spark,
        key,
        _CODEBOOK_SCHEMA,
        lambda: S.pq_codebooks(corpus, m, n_codes, iters),
        lambda r: (r["s"], r["code"]),
    )


def cached_auto_cells(corpus: DataFrame, sf_dir: str) -> int:
    """auto_n_cells(corpus row count), memoized per corpus version —
    d11's cell-count rule needs one count job that is a pure function of
    the fixture."""
    _guard_corpus(corpus, sf_dir)
    key = ("n_auto", _fingerprint(sf_dir))
    if key not in _counts:
        from liq_stream_spark.operators.similarity import auto_n_cells

        _counts[key] = auto_n_cells(corpus.count())
    return _counts[key]


def ensure_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    sf_dir: str,
    n_cells: int = 16,
    iters: int = 2,
    m: int | None = None,
    n_codes: int = 16,
) -> str:
    """Ensure the FULL persistent index (inverted file + code lists, not
    just the training outputs) exists for this corpus version; return
    its path for the store probes (store.ivf_topk_from_store etc.).
    Builds once per (corpus fingerprint, params) across processes; the
    training halves reuse cached_centroids/cached_codebooks so nothing
    trains twice."""
    _guard_corpus(corpus, sf_dir)
    fp = _fingerprint(sf_dir)  # computed once, shared with the halves
    key = ("annidx", fp, n_cells, iters, m, n_codes)
    disk = _disk_path(key)
    if not os.path.isdir(disk):
        from liq_stream_spark import store

        tmp = f"{disk}.tmp.{store._swap_token()}"
        shutil.rmtree(tmp, ignore_errors=True)
        centroids = cached_centroids(
            spark, corpus, sf_dir, n_cells, iters, _fp=fp
        )
        store.write_ivf_index(
            corpus, tmp, n_cells=n_cells, iters=iters, centroids=centroids
        )
        if m is not None:
            # cells come from the inverted file JUST written above —
            # explicitly, because an explicit centroids argument now
            # outranks disk reuse in write_pq_index and would re-run
            # the corpus-x-centroids assignment pass
            store.write_pq_index(
                corpus,
                tmp,
                m=m,
                n_codes=n_codes,
                iters=iters,
                codebooks=cached_codebooks(
                    spark, corpus, sf_dir, m, n_codes, iters, _fp=fp
                ),
                cells=spark.read.parquet(f"{tmp}/inverted").select(
                    "neighbor_id", F.col("cell").cast("long").alias("cell")
                ),
            )
        _publish(tmp, disk)
    return disk


def ensure_band_index(
    spark: SparkSession,
    docs: DataFrame,
    sf_dir: str,
    n_buckets: int = 64,
    bands: int = 4,
    rows_per_band: int = 4,
) -> str:
    """The dedup-side twin of :func:`ensure_ann_index`: ensure the
    bucketed MinHash band index (store.write_band_index) exists for
    this corpus version and is attached to THIS session's catalog;
    return the TABLE name for band_collision_pairs_from_index /
    append_to_band_index.

    The full corpus hash+shuffle is paid once per (documents
    fingerprint, banding params) ACROSS processes: a later session
    finds the published root on disk and re-attaches it with
    store.register_band_index — a metadata-only statement, after which
    the self-join still plans with zero Exchange beneath it. The table
    name carries the disk key's digest, so a fixture rewrite yields a
    fresh build under a fresh name and can never serve stale pairs
    (same staleness contract as the ANN store). Builds publish by
    atomic rename; a concurrent builder that loses the race discards
    its copy and re-attaches the winner's."""
    _guard_bare_scan(docs, sf_dir, "documents.parquet", ("doc_id", "text"))
    fp = _fingerprint(sf_dir, "documents.parquet")
    from liq_stream_spark import store

    key = ("bandidx", fp, n_buckets, bands, rows_per_band)
    disk = _disk_path(key)
    table = store.band_table_name(disk)

    if not os.path.isdir(disk):
        import uuid

        tmp = f"{disk}.tmp.{store._swap_token()}"
        shutil.rmtree(tmp, ignore_errors=True)
        # saveAsTable needs a catalog name even for the build; tie the
        # throwaway entry to the tmp path and drop it after publish —
        # the durable entry is re-created against the FINAL path below
        tmp_table = f"{table}_build_{uuid.uuid4().hex[:8]}"
        try:
            store.write_band_index(
                docs,
                tmp_table,
                tmp,
                n_buckets=n_buckets,
                bands=bands,
                rows_per_band=rows_per_band,
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        _publish(tmp, disk)
    store.register_band_index(spark, table, disk)
    return table
