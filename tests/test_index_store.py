"""Persistent ANN index store (store.write_ivf_index / write_pq_index +
*_from_store probes) and the store-backed index_cache shim (r8,
VERDICT r7 item 1): results from the stored index must be row-identical
to the direct operators, the probe plans must never rebuild the index,
and the cache must refuse foreign corpora and track fixture versions."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from liq_stream_spark import store
from liq_stream_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture()
def queries(emb):
    return emb.filter(F.col("vec_id") < 20)


@pytest.fixture()
def index_path(spark, emb, tmp_path):
    path = str(tmp_path / "ann")
    store.write_ivf_index(emb, path, n_cells=8, iters=2)
    store.write_pq_index(emb, path, m=8, n_codes=16, iters=2)
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_from_store_matches_direct(spark, emb, queries, index_path):
    """Pruned (nprobe=2) AND exact-degenerate (nprobe=n_cells) probes
    from the stored index equal the direct operator row-for-row — the
    build is deterministic and parquet round-trips doubles exactly."""
    for nprobe in (2, 8):
        got = _rows(
            store.ivf_topk_from_store(
                spark, queries, index_path, k=5, nprobe=nprobe
            )
        )
        want = _rows(
            S.ivf_topk(queries, emb, k=5, n_cells=8, nprobe=nprobe)
        )
        assert got == want and got, nprobe


def test_pq_from_store_matches_direct(spark, emb, queries, index_path):
    got = _rows(store.pq_topk_from_store(spark, queries, index_path, k=5))
    want = _rows(S.pq_topk(queries, emb, k=5, m=8, n_codes=16))
    assert got == want and got


def test_ivfpq_from_store_matches_direct(spark, emb, queries, index_path):
    got = _rows(
        store.ivfpq_topk_from_store(spark, queries, index_path, k=5, nprobe=3)
    )
    want = _rows(
        S.ivfpq_topk(queries, emb, k=5, n_cells=8, nprobe=3, m=8, n_codes=16)
    )
    assert got == want and got


def test_write_pq_index_reuses_stored_inverted_cells(spark, emb, tmp_path):
    """r8 review: with an inverted file already at ``path``, the PQ half
    must attach cells from it instead of re-running the
    corpus-x-centroids assignment (the dominant offline cost, paid once
    at write_ivf_index time) — and the reused cells must agree with the
    inverted file row-for-row."""
    from unittest import mock

    path = str(tmp_path / "ann")
    store.write_ivf_index(emb, path, n_cells=8, iters=2)
    with mock.patch.object(
        S,
        "_assign_cells",
        side_effect=AssertionError("re-ran the assignment pass"),
    ):
        store.write_pq_index(emb, path, m=8, n_codes=16, iters=2)
    codes = spark.read.parquet(f"{path}/codes")
    inv = spark.read.parquet(f"{path}/inverted")
    got = {
        (r["neighbor_id"], r["cell"])
        for r in codes.select("neighbor_id", "cell").distinct().collect()
    }
    want = {
        (r["neighbor_id"], r["cell"])
        for r in inv.select("neighbor_id", "cell").collect()
    }
    assert got == want and got


def test_write_pq_index_explicit_centroids_beat_stale_inverted(
    spark, emb, tmp_path
):
    """r8 review: explicit arguments outrank disk state — a caller
    refreshing the PQ half with fresh centroids must get a fresh
    assignment of the ACTUAL corpus, never the stale inverted file's."""
    path = str(tmp_path / "ann")
    old = emb.filter(F.col("vec_id") < 10)  # stale, partial corpus
    store.write_ivf_index(old, path, n_cells=4, iters=2)
    cents = spark.read.parquet(f"{path}/centroids")
    store.write_pq_index(emb, path, m=8, n_codes=16, iters=2, centroids=cents)
    codes = spark.read.parquet(f"{path}/codes")
    # every corpus vector is encoded — nothing dropped through the
    # stale inverted file's 10-vector assignment
    assert codes.select("neighbor_id").distinct().count() == emb.count()


def test_write_pq_index_rejects_uncovering_cell_source(spark, emb, tmp_path):
    """r8 review: a disk-read cell source that misses corpus vectors
    must raise at write time instead of silently dropping them from the
    code table (the cell join is inner)."""
    path = str(tmp_path / "ann")
    store.write_ivf_index(
        emb.filter(F.col("vec_id") < 10), path, n_cells=4, iters=2
    )
    with pytest.raises(ValueError, match="does not cover"):
        store.write_pq_index(emb, path, m=8, n_codes=16, iters=2)


def test_ivfpq_topk_rejects_probes_without_centroids(spark, emb, queries):
    """r8 review: building codes under caller-supplied probes with no
    centroids must raise — a silent retrain could route probes against
    disagreeing cell ids."""
    probes = spark.createDataFrame(
        [(0, 0), (1, 1)], "query_id long, cell long"
    )
    with pytest.raises(ValueError, match="routed with"):
        S.ivfpq_topk(queries, emb, k=5, probes=probes)


def test_from_store_supports_string_ids(spark, tmp_path):
    """r8 review: the collected probe frame keeps the queries frame's id
    dtype — string-keyed corpora probe the store end-to-end."""
    import random

    rng = random.Random(7)
    rows = [
        (f"doc-{i:03d}", [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "name string, emb array<double>")
    path = str(tmp_path / "ann")
    store.write_ivf_index(
        corpus, path, n_cells=4, iters=2, id_col="name", vec_col="emb"
    )
    store.write_pq_index(
        corpus, path, m=4, n_codes=8, iters=2, id_col="name", vec_col="emb"
    )
    qs = corpus.limit(5)
    for fn in (store.ivf_topk_from_store, store.ivfpq_topk_from_store):
        got = fn(spark, qs, path, k=3, nprobe=2, id_col="name", vec_col="emb")
        assert got.count() > 0
        assert {r["query_id"] for r in got.select("query_id").collect()} <= {
            r["name"] for r in qs.collect()
        }


def _build_half(emb, path):
    """IVF+PQ store over the first half of the fixture (the 'yesterday'
    corpus an incremental deployment built once)."""
    half = emb.filter(F.col("vec_id") < 250)
    store.write_ivf_index(half, path, n_cells=8, iters=2)
    store.write_pq_index(half, path, m=8, n_codes=16, iters=2)
    return half


def test_append_matches_from_scratch_build(spark, emb, queries, tmp_path):
    """VERDICT r8 item 1's done-gate: build on half the fixture, append
    the other half, and every store probe (s06/s08 shape) is
    row-identical to a from-scratch write of the FULL corpus against the
    SAME frozen centroids/codebooks — assignment and encoding are
    deterministic per row, so the exact-equality check is meaningful,
    not flaky."""
    inc = str(tmp_path / "inc")
    _build_half(emb, inc)
    store.append_to_ivf_index(emb.filter(F.col("vec_id") >= 250), inc)

    scratch = str(tmp_path / "scratch")
    cents = spark.read.parquet(f"{inc}/centroids")
    books = spark.read.parquet(f"{inc}/codebooks")
    store.write_ivf_index(emb, scratch, centroids=cents)
    store.write_pq_index(
        emb,
        scratch,
        codebooks=books,
        cells=spark.read.parquet(f"{scratch}/inverted").select(
            "neighbor_id", F.col("cell").cast("long").alias("cell")
        ),
    )
    for probe in (
        lambda p: store.ivf_topk_from_store(spark, queries, p, k=5, nprobe=3),
        lambda p: store.ivfpq_topk_from_store(
            spark, queries, p, k=5, nprobe=3
        ),
        lambda p: store.pq_topk_from_store(spark, queries, p, k=5),
    ):
        got, want = _rows(probe(inc)), _rows(probe(scratch))
        assert got == want and got
    # and the appended rows actually landed in cell partitions alongside
    # the original build's (one inverted file, both eras)
    inv = spark.read.parquet(f"{inc}/inverted")
    assert inv.count() == emb.count()


def test_append_touches_only_batch_and_training_frames(
    spark, emb, tmp_path, monkeypatch
):
    """The O(batch) pin: with check_ids=False the append job reads ONLY
    the tiny training frames (centroids/codebooks) — never the inverted
    file or code table — and never calls a trainer. That is the
    never-rescan-old-cells contract that makes ingest cost independent
    of corpus size."""
    from pyspark.sql.readwriter import DataFrameReader

    path = str(tmp_path / "ann")
    _build_half(emb, path)

    read_paths = []
    real = DataFrameReader.parquet

    def recording(self, *paths):
        read_paths.extend(paths)
        return real(self, *paths)

    monkeypatch.setattr(DataFrameReader, "parquet", recording)
    for trainer in ("kmeans_centroids", "pq_codebooks"):
        monkeypatch.setattr(
            S,
            trainer,
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError("trainer ran during append")
            ),
        )
    store.append_to_ivf_index(
        emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 400)),
        path,
        check_ids=False,
    )
    assert read_paths, "expected the training-frame reads"
    for p in read_paths:
        assert p.endswith("/centroids") or p.endswith("/codebooks"), (
            f"append read {p} — old index data must never be rescanned"
        )
    # VERDICT r9 item 2's done-gate: the GUARDED append reads only the
    # training frames + the ids membership sidecar — never the posting
    # lists (inverted/codes), so the duplicate-id check is no longer an
    # O(corpus) scan of per-append small files
    read_paths.clear()
    store.append_to_ivf_index(
        emb.filter(F.col("vec_id") >= 400), path, check_ids=True
    )
    assert read_paths
    for p in read_paths:
        assert (
            p.endswith("/centroids")
            or p.endswith("/codebooks")
            or p.endswith("/_ids")
        ), f"guarded append read {p} — posting lists must not be scanned"
    assert any(p.endswith("/_ids") for p in read_paths)


def test_append_refuses_duplicate_ids(spark, emb, tmp_path):
    """Default-on id guard: re-appending rows already in the index would
    duplicate posting-list rows; the check broadcast-anti-joins the
    batch against ONE column of the inverted file and raises."""
    path = str(tmp_path / "ann")
    _build_half(emb, path)
    with pytest.raises(ValueError, match="already present"):
        store.append_to_ivf_index(emb.filter(F.col("vec_id") < 10), path)


def test_append_refuses_version_and_shape_mismatch(spark, emb, tmp_path):
    """Cross-version and wrong-corpus appends fail loudly BEFORE any
    write: mixed assignment rules or mixed dims inside one inverted file
    would corrupt silently."""
    import json
    import os

    batch = emb.filter(F.col("vec_id") >= 250)
    # no meta sidecar (a pre-r9 store): refuse with the rebuild hint
    bare = str(tmp_path / "bare")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), bare)
    os.remove(os.path.join(bare, "_liq_index_meta.json"))
    with pytest.raises(ValueError, match="meta sidecar"):
        store.append_to_ivf_index(batch, bare)
    # builder-version mismatch
    vpath = str(tmp_path / "vers")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), vpath)
    meta_file = os.path.join(vpath, "_liq_index_meta.json")
    meta = json.load(open(meta_file))
    meta["builder_version"] = "v0"
    json.dump(meta, open(meta_file, "w"))
    with pytest.raises(ValueError, match="builder"):
        store.append_to_ivf_index(batch, vpath)
    # dim mismatch (a 32-dim batch against the 64-dim index)
    dpath = str(tmp_path / "dim")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), dpath)
    narrow = batch.withColumn("embedding", F.slice("embedding", 1, 32))
    with pytest.raises(ValueError, match="dims"):
        store.append_to_ivf_index(narrow, dpath)


def test_append_ivf_only_store_skips_pq(spark, emb, tmp_path):
    """An IVF-only store (no PQ half) appends the inverted file and
    stops — no codebooks read, no codes dir created."""
    import os

    path = str(tmp_path / "ivfonly")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), path)
    store.append_to_ivf_index(emb.filter(F.col("vec_id") >= 250), path)
    assert not os.path.isdir(f"{path}/codes")
    assert spark.read.parquet(f"{path}/inverted").count() == emb.count()


def test_compact_index_partitions_preserves_results(spark, emb, tmp_path):
    """r9: the append→compact lifecycle. Three appends leave multiple
    files per touched cell; compaction folds each cell back to ONE file
    with rows unchanged — probe results identical, no retraining (the
    trainers are poisoned), and the only thing read is the layer being
    compacted."""
    import glob

    from unittest import mock

    path = str(tmp_path / "ann")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 200), path)
    for lo, hi in ((200, 300), (300, 400), (400, 500)):
        store.append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path,
            check_ids=False,
        )
    queries = emb.filter(F.col("vec_id") < 20)
    before = _rows(
        store.ivf_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    cell_dirs = glob.glob(f"{path}/inverted/cell=*")
    assert max(
        len(glob.glob(f"{d}/*.parquet")) for d in cell_dirs
    ) > 1, "appends should have left multi-file cells"
    ids_files_before = len(glob.glob(f"{path}/_ids/*.parquet"))
    assert ids_files_before > 1, "appends should have left ids small files"
    with mock.patch.object(
        S,
        "kmeans_centroids",
        side_effect=AssertionError("compaction must not retrain"),
    ):
        store.compact_index_partitions(spark, path, "inverted")
    for d in glob.glob(f"{path}/inverted/cell=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d
    after = _rows(
        store.ivf_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    assert after == before and after
    # the ids sidecar folded in the same window, content intact: the
    # guard still refuses every already-indexed id
    assert len(glob.glob(f"{path}/_ids/*.parquet")) < ids_files_before
    assert (
        spark.read.parquet(f"{path}/_ids").count()
        == spark.read.parquet(f"{path}/inverted").count()
    )
    with pytest.raises(ValueError, match="already present"):
        store.append_to_ivf_index(emb.limit(3), path)


def test_compact_codes_layer_preserves_probe_results(spark, emb, tmp_path):
    """The PQ code lists compact through the same path as the inverted
    file (split col from the meta sidecar — both layers carry
    neighbor_id): files fold to one per cell, IVF-PQ probes identical,
    and the ids sidecar is NOT rewritten by the codes pass (it folds
    with the inverted pass only, so a two-layer maintenance run
    rewrites it once)."""
    import glob

    path = str(tmp_path / "ann")
    _build_half(emb, path)
    for lo, hi in ((250, 350), (350, 500)):
        store.append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path,
            check_ids=False,
        )
    queries = emb.filter(F.col("vec_id") < 10)
    before = _rows(
        store.ivfpq_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    assert max(
        len(glob.glob(f"{d}/*.parquet"))
        for d in glob.glob(f"{path}/codes/cell=*")
    ) > 1
    ids_files = set(glob.glob(f"{path}/_ids/*.parquet"))
    store.compact_index_partitions(spark, path, "codes")
    assert set(glob.glob(f"{path}/_ids/*.parquet")) == ids_files
    for d in glob.glob(f"{path}/codes/cell=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d
    after = _rows(
        store.ivfpq_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    assert after == before and after


def test_append_guard_backfills_legacy_sidecar(spark, emb, tmp_path):
    """A pre-r10 store has no _ids sidecar: the first guarded append
    backfills it ONCE from the inverted file's id column, then the
    guard works purely off the sidecar — dup ids still refuse, fresh
    ids still land."""
    path = str(tmp_path / "legacy")
    _build_half(emb, path)
    shutil.rmtree(f"{path}/_ids")
    with pytest.raises(ValueError, match="already present"):
        store.append_to_ivf_index(emb.filter(F.col("vec_id") < 10), path)
    assert os.path.isdir(f"{path}/_ids"), "guard should have backfilled"
    store.append_to_ivf_index(emb.filter(F.col("vec_id") >= 250), path)
    assert spark.read.parquet(f"{path}/inverted").count() == emb.count()


def test_unguarded_append_still_maintains_sidecar(spark, emb, tmp_path):
    """check_ids=False skips the READ, not the WRITE: the batch's ids
    are appended to the sidecar either way, so a later guarded append
    of the same ids refuses — an unguarded fast-path ingest never
    blinds future guards."""
    path = str(tmp_path / "ann")
    _build_half(emb, path)
    batch = emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 300))
    store.append_to_ivf_index(batch, path, check_ids=False)
    with pytest.raises(ValueError, match="already present"):
        store.append_to_ivf_index(batch, path, check_ids=True)


def test_write_ivf_index_rejects_wrong_width_centroids(spark, emb, tmp_path):
    """ADVICE r9 (store.py:475): prebuilt centroids from a different-
    width corpus must raise BEFORE anything is written, mirroring the
    PQ half's codebook guard — not surface as a numpy broadcast error
    mid-job."""
    narrow = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    cents32 = S.kmeans_centroids(narrow, 4, 1)
    path = str(tmp_path / "w")
    with pytest.raises(ValueError, match="dims"):
        store.write_ivf_index(emb, path, centroids=cents32)
    assert not os.path.isdir(f"{path}/centroids"), "must refuse pre-write"


def test_index_root_must_be_local(spark, emb, tmp_path):
    """ADVICE r9 (store.py:425): the sidecar/meta/swap I/O is local-FS
    only — a URI-schemed root (s3a://, hdfs://) refuses up front
    instead of silently writing the sidecar to a bogus local dir;
    file: roots are normalized and fully supported."""
    with pytest.raises(ValueError, match="local"):
        store.write_ivf_index(emb, "s3a://bucket/ann")
    with pytest.raises(ValueError, match="local"):
        store.append_to_ivf_index(emb, "hdfs://nn/ann")
    with pytest.raises(ValueError, match="local"):
        store.compact_index_partitions(spark, "s3a://bucket/ann")
    # file: URI end-to-end: build, guarded append, probe
    furi = f"file://{tmp_path}/furi"
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), furi, n_cells=8)
    assert os.path.isfile(f"{tmp_path}/furi/_liq_index_meta.json")
    store.append_to_ivf_index(emb.filter(F.col("vec_id") >= 250), furi)
    got = store.ivf_topk_from_store(
        spark, emb.filter(F.col("vec_id") < 5), furi, k=3, nprobe=2
    )
    assert got.count() == 15


def test_compact_swap_crash_recovery(spark, emb, tmp_path):
    """ADVICE r9 (medium, store.py:817): a crash between compaction's
    two renames leaves no live layer — only the .old copy. The next
    compaction run detects that and RESTORES the layer before working;
    probe results equal the pre-crash state."""
    path = str(tmp_path / "ann")
    _build_half(emb, path)
    store.append_to_ivf_index(
        emb.filter(F.col("vec_id") >= 250), path, check_ids=False
    )
    queries = emb.filter(F.col("vec_id") < 10)
    before = _rows(
        store.ivf_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    # simulate the crash window: live layer renamed away, process died
    os.rename(f"{path}/inverted", f"{path}/inverted.old.otherhost-1-ab12cd34")
    store.compact_index_partitions(spark, path, "inverted")
    after = _rows(
        store.ivf_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    assert after == before and after
    assert not os.path.exists(f"{path}/inverted.old.otherhost-1-ab12cd34")


def test_compact_failure_arm_restores_live_and_cleans_tmp(
    spark, emb, tmp_path, monkeypatch
):
    """ADVICE r9: when the tmp->live rename fails, the old layer is
    restored AND the compacted tmp dir is removed — no leak, no dead
    store."""
    import glob

    path = str(tmp_path / "ann")
    _build_half(emb, path)
    queries = emb.filter(F.col("vec_id") < 10)
    before = _rows(
        store.ivf_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    real_rename = os.rename

    def failing(src, dst, *a, **k):
        if ".compact.tmp." in str(src):
            raise OSError("injected rename failure")
        return real_rename(src, dst, *a, **k)

    monkeypatch.setattr(os, "rename", failing)
    with pytest.raises(OSError, match="injected"):
        store.compact_index_partitions(spark, path, "inverted")
    monkeypatch.undo()
    assert os.path.isdir(f"{path}/inverted"), "live layer must be restored"
    assert not glob.glob(f"{path}/inverted.compact.tmp.*"), "tmp leaked"
    assert not glob.glob(f"{path}/inverted.old.*"), "old hop leaked"
    after = _rows(
        store.ivf_topk_from_store(spark, queries, path, k=5, nprobe=3)
    )
    assert after == before


def test_compact_sweeps_aged_swap_leftovers(spark, emb, tmp_path):
    """Aged .old / .compact.tmp leftovers beside a LIVE layer (crash
    after the swap completed) are swept on the next compaction entry;
    fresh ones and live-creator ones survive."""
    import time

    path = str(tmp_path / "ann")
    _build_half(emb, path)
    day_ago = time.time() - 90000
    aged_old = f"{path}/inverted.old.otherhost-7-11111111"
    aged_tmp = f"{path}/inverted.compact.tmp.otherhost-7-22222222"
    mine_fresh = f"{path}/inverted.compact.tmp.{store._swap_token()}"
    for d in (aged_old, aged_tmp, mine_fresh):
        os.makedirs(d)
    for d in (aged_old, aged_tmp):
        os.utime(d, (day_ago, day_ago))
    store.compact_index_partitions(spark, path, "inverted")
    assert not os.path.exists(aged_old) and not os.path.exists(aged_tmp)
    assert os.path.exists(mine_fresh)  # this process is alive: kept


def test_write_pq_index_derives_m_from_supplied_codebooks(
    spark, emb, tmp_path
):
    """ADVICE r8: codebooks trained with m=16 under a left-at-default
    m=8 must encode ALL 16 subspaces (m is a property of the codebooks),
    and codebooks from a different-width corpus must raise before
    anything is written."""
    books16 = S.pq_codebooks(emb, m=16, n_codes=8, iters=1)
    path = str(tmp_path / "pq")
    store.write_pq_index(emb, path, codebooks=books16)  # m left at 8
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.agg(F.max("s")).first()[0] == 15
    assert codes.count() == emb.count() * 16
    # wrong-width codebooks: 64-dim books against a 32-dim corpus
    narrow = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="dims"):
        store.write_pq_index(narrow, str(tmp_path / "bad"), codebooks=books16)


def test_publish_discards_loser_on_rename_race(tmp_path):
    """Concurrent builders: the loser of the atomic-rename race discards
    its copy and the winner's published dir is untouched (no Spark
    needed — pure filesystem contract)."""
    from liq_stream_spark.plans.index_cache import _publish

    dst = tmp_path / "key"
    dst.mkdir()
    (dst / "winner").write_text("w")
    tmp = tmp_path / "key.tmp.123"
    tmp.mkdir()
    (tmp / "loser").write_text("l")
    _publish(str(tmp), str(dst))
    assert (dst / "winner").read_text() == "w"
    assert not (dst / "loser").exists() and not tmp.exists()


def test_ivfpq_from_store_rejects_cell_less_codes(
    spark, emb, queries, tmp_path
):
    """r8 review: a code table written standalone (no IVF half, so no
    cell column) must fail the IVF-PQ probe with a clear error at read
    time, not an opaque unresolved-column crash mid-plan."""
    path = str(tmp_path / "ann")
    store.write_pq_index(emb, path, m=8, n_codes=16, iters=2)  # cell-less
    store.write_ivf_index(emb, path, n_cells=8, iters=2)  # adds centroids
    assert "cell" not in spark.read.parquet(f"{path}/codes").columns
    with pytest.raises(ValueError, match="no cell column"):
        store.ivfpq_topk_from_store(spark, queries, path, k=5, nprobe=3)


def test_store_probe_never_rebuilds_and_partition_prunes(
    spark, queries, index_path
):
    """THE plan pin of the offline/online split: the probe plan's only
    scan of the embeddings table is the query side — the corpus enters
    exclusively through the stored index files — and the inverted-file
    scan carries a cell partition filter, so a pruned probe physically
    reads ~nprobe/n_cells of the index (the FAISS posting-list read)."""
    df = store.ivf_topk_from_store(spark, queries, index_path, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the router ran ONCE at probe-collect time (r8 review: it used to
    # re-execute inside the plan); the plan's query side is the
    # collected local probe frame, so the embeddings table appears
    # NOWHERE — the corpus enters exclusively through the stored index
    assert plan.count("embeddings.parquet") == 0, plan[:800]
    # identify the inverted-file scan by its columns (the Location string
    # is truncated under long tmp paths)
    inv_scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "neighbor_id#" in ln and "vec#" in ln
    ]
    assert len(inv_scan) == 1, plan[:800]
    # the cell IN (...) filter reached the partitioned scan: only the
    # probed cell directories are read (the FAISS posting-list read)
    assert "PartitionFilters" in inv_scan[0] and "cell" in inv_scan[0], (
        inv_scan[0]
    )
    # no Lloyd lineage in the probe: the per-dim posexplode/avg rollup
    # exists only in the (offline) kmeans build
    assert "posexplode" not in plan


def test_index_cache_guard_rejects_foreign_frames(spark, emb):
    """ADVICE r7: a filtered/derived/foreign frame must raise, not
    poison the fingerprint-keyed cache for later callers."""
    from liq_stream_spark.plans import index_cache as IC

    with pytest.raises(ValueError, match="BARE scan"):
        IC.cached_centroids(
            spark, emb.filter(F.col("vec_id") < 100), SF, n_cells=8
        )
    with pytest.raises(ValueError, match="BARE scan"):
        IC.cached_centroids(spark, emb.select("vec_id", "embedding"), SF, 8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="embeddings table"):
        IC.cached_codebooks(spark, docs, SF, m=8)


def test_index_cache_guard_rejects_sibling_paths(spark, tmp_path):
    """r8 review: a sibling sharing the path PREFIX
    (embeddings.parquet.bak) must not pass the separator-bounded check —
    its rows would be cached under the real corpus's fingerprint."""
    from liq_stream_spark.plans import index_cache as IC

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    src = f"{SF}/embeddings.parquet"
    for name in ("embeddings.parquet", "embeddings.parquet.bak"):
        dst = str(corpus_dir / name)
        (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
    bak = spark.read.parquet(str(corpus_dir / "embeddings.parquet.bak"))
    with pytest.raises(ValueError, match="embeddings table"):
        IC.cached_centroids(spark, bak, str(corpus_dir), n_cells=8)


def test_offline_probe_arm_runs_without_collect(
    spark, emb, queries, index_path
):
    """VERDICT r8 item 4: the escape hatch _collect_probes' docstring
    routes million-query OFFLINE batches to — ivf_topk/ivfpq_topk fed
    the STORED frames directly, router in-plan, zero driver collects —
    is executable and row-identical, not prose. The executed plan must
    contain no LocalTableScan (the signature of a collected-and-
    recreated local frame): every input is a file scan, so the arm
    scales to query batches that could never sit on the driver."""
    from liq_stream_spark.operators.similarity import _probe_cells

    centroids = spark.read.parquet(f"{index_path}/centroids")
    inverted = spark.read.parquet(f"{index_path}/inverted")
    out = S.ivf_topk(
        queries,
        corpus=None,
        k=5,
        nprobe=3,
        inverted=inverted,
        probes=_probe_cells(queries, centroids, 3, "vec_id", "embedding"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan, plan[:800]
    got = _rows(out)
    want = _rows(
        store.ivf_topk_from_store(spark, queries, index_path, k=5, nprobe=3)
    )
    assert got == want and got

    codebooks = spark.read.parquet(f"{index_path}/codebooks")
    m = codebooks.agg(F.max("s")).first()[0] + 1
    out2 = S.ivfpq_topk(
        queries,
        corpus=None,
        k=5,
        nprobe=3,
        m=m,
        codebooks=codebooks,
        codes=spark.read.parquet(f"{index_path}/codes"),
        probes=_probe_cells(
            queries, centroids, 3, "vec_id", "embedding"
        ).select("query_id", "cell"),
    )
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan2, plan2[:800]
    got2 = _rows(out2)
    want2 = _rows(
        store.ivfpq_topk_from_store(spark, queries, index_path, k=5, nprobe=3)
    )
    assert got2 == want2 and got2


def test_guard_passes_bare_scan_under_nodeword_path(spark, tmp_path):
    """VERDICT r8 item 5: the guard is structural (leaf-ness of the
    analyzed plan), so a fixture path containing a node-name word —
    which the old rendered-string substring match would false-reject —
    passes a legitimate bare scan."""
    from liq_stream_spark.plans import index_cache as IC

    corpus_dir = tmp_path / "Filter-Join-corpus"  # node words in the path
    corpus_dir.mkdir()
    src = f"{SF}/embeddings.parquet"
    dst = str(corpus_dir / "embeddings.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
    bare = spark.read.parquet(dst)
    IC._guard_corpus(bare, str(corpus_dir))  # must not raise
    with pytest.raises(ValueError, match="BARE scan"):
        IC._guard_corpus(bare.filter(F.col("vec_id") < 9), str(corpus_dir))


def test_fingerprint_salts_file_content(tmp_path):
    """ADVICE r8: a fixture rewritten with size AND mtime preserved
    (restore tools keep timestamps) must still change the fingerprint —
    the head/tail content salt catches what the stat-walk alone
    cannot."""
    from liq_stream_spark.plans.index_cache import _fingerprint

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    f = corpus_dir / "embeddings.parquet"
    f.write_bytes(b"A" * 10000)
    st = os.stat(f)
    before = _fingerprint(str(tmp_path / "corpus"))
    data = bytearray(b"A" * 10000)
    data[-10] = ord("B")  # same size, tail byte flipped
    f.write_bytes(bytes(data))
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))  # restore mtime
    assert _fingerprint(str(tmp_path / "corpus")) != before


def test_sweep_orphan_tmps(tmp_path):
    """ADVICE r8 + r9: dead-creator tmp dirs are swept only past the
    grace hour (a bare-pid probe is namespace-local — a builder in
    another container can look dead), a DEFINITIVELY alive creator's
    tmp is never swept no matter its age (ADVICE r9: a same-host
    builder genuinely running >24h must not lose its publish), and
    unprobeable tokens (other host, unparseable) go only by the
    day-old rule."""
    import socket
    import time

    from liq_stream_spark.plans.index_cache import _publish

    root = tmp_path / "store"
    root.mkdir()
    two_h = time.time() - 7200
    day_ago = time.time() - 90000
    host = socket.gethostname()
    dead_old = root / "k1.tmp.999999999"  # dead pid, past grace: swept
    dead_old.mkdir()
    os.utime(dead_old, (two_h, two_h))
    dead_fresh = root / "k5.tmp.999999998"  # dead pid but FRESH: kept
    dead_fresh.mkdir()  # (could be a live cross-namespace builder)
    stale = root / f"k2.tmp.{os.getpid()}x"  # unparseable + fresh: kept
    stale.mkdir()
    alive_old = root / "k3.tmp.1"  # pid 1 (init) ALIVE: kept even day-old
    alive_old.mkdir()
    os.utime(alive_old, (day_ago, day_ago))
    live = root / f"k4.tmp.{os.getpid()}"  # this very process: kept
    live.mkdir()
    # r10 host-pid-uuid tokens: same-host probes are definitive
    tok_dead = root / f"k6.tmp.{host}-999999999-deadbeef"
    tok_dead.mkdir()  # dead on THIS host, past grace: swept
    os.utime(tok_dead, (two_h, two_h))
    tok_live = root / f"k7.tmp.{host}-{os.getpid()}-cafef00d"
    tok_live.mkdir()  # alive on this host, day-old: kept (ADVICE r9)
    os.utime(tok_live, (day_ago, day_ago))
    tok_other = root / "k8.tmp.otherhost-1-12345678"
    tok_other.mkdir()  # other host (unprobeable), day-old: swept
    os.utime(tok_other, (day_ago, day_ago))
    tok_other_fresh = root / "k9.tmp.otherhost-1-87654321"
    tok_other_fresh.mkdir()  # other host, past grace only: kept
    os.utime(tok_other_fresh, (two_h, two_h))
    src = root / "key.tmp.555"
    src.mkdir()
    _publish(str(src), str(root / "key"))
    assert not dead_old.exists() and not tok_dead.exists()
    assert not tok_other.exists()
    assert live.exists() and stale.exists() and dead_fresh.exists()
    assert alive_old.exists() and tok_live.exists()
    assert tok_other_fresh.exists()
    assert (root / "key").exists()


def test_index_cache_serves_from_disk_without_rebuild(
    spark, emb, tmp_path, monkeypatch
):
    """Cross-process persistence: after one build, a fresh process (here:
    a cleared in-process memo) must serve the index from parquet without
    ever calling the trainer again — and the served rows are identical."""
    from liq_stream_spark.plans import index_cache as IC

    monkeypatch.setenv("LIQ_ANN_STORE", str(tmp_path / "store"))
    IC._rows.clear()
    built = IC.cached_centroids(spark, emb, SF, n_cells=8).collect()
    IC._rows.clear()

    def boom(*a, **k):
        raise AssertionError("trainer must not run on a disk hit")

    monkeypatch.setattr(S, "kmeans_centroids", boom)
    served = IC.cached_centroids(spark, emb, SF, n_cells=8).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, built))


def test_index_cache_fingerprint_tracks_fixture_versions(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7's second hazard: a corpus REWRITTEN on disk must get a
    fresh index, not the previous version's. The fingerprint folds every
    file's size+mtime into the key, so touching the fixture changes the
    key and forces a rebuild."""
    from liq_stream_spark.plans import index_cache as IC

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    src = f"{SF}/embeddings.parquet"
    dst = str(corpus_dir / "embeddings.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)

    monkeypatch.setenv("LIQ_ANN_STORE", str(tmp_path / "store"))
    calls = []
    real = S.kmeans_centroids

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(S, "kmeans_centroids", counting)
    emb2 = spark.read.parquet(dst)
    IC.cached_centroids(spark, emb2, str(corpus_dir), n_cells=8)
    assert len(calls) == 1
    # same version -> no rebuild (memo or disk)
    IC.cached_centroids(spark, emb2, str(corpus_dir), n_cells=8)
    assert len(calls) == 1
    # bump mtime = new corpus version -> rebuild
    probe = dst
    if os.path.isdir(dst):
        probe = os.path.join(
            dst, next(f for f in os.listdir(dst) if f.endswith(".parquet"))
        )
    st = os.stat(probe)
    os.utime(probe, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    IC.cached_centroids(spark, emb2, str(corpus_dir), n_cells=8)
    assert len(calls) == 2


def test_ensure_ann_index_builds_once_per_version(
    spark, emb, tmp_path, monkeypatch
):
    """ensure_ann_index must write the full layout (centroids, inverted,
    codebooks, codes) exactly once per (fingerprint, params), and the
    published dir must be complete (atomic rename — no torn reads)."""
    from liq_stream_spark.plans import index_cache as IC

    monkeypatch.setenv("LIQ_ANN_STORE", str(tmp_path / "store"))
    IC._rows.clear()
    path = IC.ensure_ann_index(spark, emb, SF, n_cells=8, m=8)
    for part in ("centroids", "inverted", "codebooks", "codes"):
        assert os.path.isdir(os.path.join(path, part)), part
    mtime = os.stat(path).st_mtime_ns
    assert IC.ensure_ann_index(spark, emb, SF, n_cells=8, m=8) == path
    assert os.stat(path).st_mtime_ns == mtime  # untouched on reuse


def test_ensure_band_index_builds_once_and_reattaches(
    spark, tmp_path, monkeypatch
):
    """ensure_band_index (r10): the corpus hash+shuffle is paid once per
    (documents fingerprint, params) — a repeat call serves the published
    root without rebuilding, a dropped catalog entry (fresh session)
    re-attaches metadata-only, a fixture rewrite keys a FRESH build
    under a fresh table name, and non-bare frames are refused."""
    from liq_stream_spark.plans.index_cache import ensure_band_index

    monkeypatch.setenv("LIQ_ANN_STORE", str(tmp_path / "store"))
    sfd = tmp_path / "sf"
    sfd.mkdir()
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(
        str(sfd / "documents.parquet")
    )
    docs = spark.read.parquet(str(sfd / "documents.parquet"))
    t1 = ensure_band_index(spark, docs, str(sfd))
    pairs = _rows(store.band_collision_pairs_from_index(spark, t1))
    assert pairs

    def boom(*a, **k):  # any rebuild attempt from here on is a bug
        raise AssertionError("rebuild attempted on an unchanged corpus")

    real_write = store.write_band_index
    monkeypatch.setattr(store, "write_band_index", boom)
    # repeat call: same table, no build
    assert ensure_band_index(spark, docs, str(sfd)) == t1
    # fresh-session simulation: catalog entry gone, root re-attaches
    spark.sql(f"DROP TABLE {t1}")
    assert ensure_band_index(spark, docs, str(sfd)) == t1
    assert _rows(store.band_collision_pairs_from_index(spark, t1)) == pairs
    # a rewritten fixture must key a FRESH build (stale pairs impossible)
    monkeypatch.setattr(store, "write_band_index", real_write)
    spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id < 200"
    ).write.mode("overwrite").parquet(str(sfd / "documents.parquet"))
    docs2 = spark.read.parquet(str(sfd / "documents.parquet"))
    t2 = ensure_band_index(spark, docs2, str(sfd))
    assert t2 != t1
    sub = _rows(store.band_collision_pairs_from_index(spark, t2))
    assert sub and set(sub) <= set(pairs)
    # guards: derived frames and foreign tables are refused
    with pytest.raises(ValueError, match="BARE scan"):
        ensure_band_index(spark, docs2.filter("doc_id < 10"), str(sfd))
    with pytest.raises(ValueError, match="documents table"):
        ensure_band_index(
            spark,
            spark.read.parquet(f"{SF}/documents.parquet"),
            str(sfd),
        )
    spark.sql(f"DROP TABLE IF EXISTS {t1}")
    spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_tools_maintain_folds_every_store_root(spark, tmp_path, monkeypatch):
    """`tools maintain` (r10): one pass over the index-cache store
    recovers/folds/sweeps every published root — ANN layers via
    compact_index_partitions, band tables via register+compact (the
    catalog re-attach means a fresh maintenance process needs no prior
    session state) — with probe results and candidate pairs identical
    before and after."""
    from liq_stream_spark import tools
    from liq_stream_spark.plans.index_cache import ensure_band_index

    monkeypatch.setenv("LIQ_ANN_STORE", str(tmp_path / "store"))
    sfd = tmp_path / "sf"
    sfd.mkdir()
    spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id < 400"
    ).write.parquet(str(sfd / "documents.parquet"))
    docs = spark.read.parquet(str(sfd / "documents.parquet"))
    table = ensure_band_index(spark, docs, str(sfd))
    band_root = [
        str(p) for p in (tmp_path / "store").iterdir()
        if p.name.startswith("bandidx-")
    ][0]
    more = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id >= 400"
    )
    store.append_to_band_index(more, table, band_root)
    pairs = _rows(store.band_collision_pairs_from_index(spark, table))
    # an ANN root with an append, directly under the same store dir
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ann_root = str(tmp_path / "store" / "annidx-test-abc123")
    store.write_ivf_index(
        emb.filter("vec_id < 400"), ann_root, n_cells=4, iters=2
    )
    store.append_to_ivf_index(
        emb.filter("vec_id >= 400"), ann_root
    )
    q = emb.filter("vec_id < 5")
    topk = _rows(store.ivf_topk_from_store(spark, q, ann_root, k=3, nprobe=2))

    def n_files(p):
        import os as _os
        return sum(len(fs) for _, _, fs in _os.walk(p))

    band_before, ann_before = n_files(band_root), n_files(ann_root)
    # the appends marked both roots dirty (the maintain skip signal)
    assert store.needs_compact(band_root) and store.needs_compact(ann_root)
    # simulate the fresh maintenance process: no catalog entry
    spark.sql(f"DROP TABLE {table}")
    assert tools.maintain() is True
    assert n_files(band_root) < band_before
    assert n_files(ann_root) < ann_before
    # ...and the pass cleared the markers
    assert not store.needs_compact(band_root)
    assert not store.needs_compact(ann_root)
    assert _rows(store.band_collision_pairs_from_index(spark, table)) == pairs
    assert _rows(store.ivf_topk_from_store(spark, q, ann_root, k=3, nprobe=2)) == topk
    # steady state is a metadata walk: a second pass rewrites NOTHING
    import os as _os

    def mtimes(p):
        return sorted(
            (_os.path.join(r, f), _os.stat(_os.path.join(r, f)).st_mtime_ns)
            for r, _, fs in _os.walk(p) for f in fs
        )

    snap = mtimes(band_root) + mtimes(ann_root)
    assert tools.maintain() is True
    assert mtimes(band_root) + mtimes(ann_root) == snap
    # a crashed swap (live layer missing, only the .old copy) is
    # recovered by the pass itself — pairs identical afterwards
    spark.sql(f"DROP TABLE {table}")
    _os.rename(band_root, f"{band_root}.old.{store._swap_token()}")
    assert not _os.path.isdir(band_root)
    assert tools.maintain() is True
    assert _os.path.isdir(band_root)
    assert _rows(store.band_collision_pairs_from_index(spark, table)) == pairs
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_rebuild_ids_repairs_crashed_band_append(spark, tmp_path, monkeypatch):
    """VERDICT r10 item 2, band family: an append killed between its
    _ids sidecar write and its data write leaves an over-claiming
    sidecar that refuses the batch's legitimate retry forever. The
    repair arm (`tools maintain --rebuild-ids`, store.rebuild_ids_sidecar
    underneath) rebuilds the sidecar from the data layer; the retry then
    lands green with the full corpus present exactly once."""
    from liq_stream_spark import tools
    from liq_stream_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t, p = "band_repair_t", str(tmp_path / "band")
    store.write_band_index(docs.filter("doc_id < 400"), t, p)
    try:
        batch = docs.filter("doc_id >= 400")
        real = D._banded_keys

        def boom(*a, **k):
            raise RuntimeError("simulated executor loss mid-append")

        monkeypatch.setattr(D, "_banded_keys", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            store.append_to_band_index(batch, t, p)
        monkeypatch.setattr(D, "_banded_keys", real)
        # the sidecar now claims rows the table lacks: retry refused,
        # and the error names the repair
        with pytest.raises(ValueError, match="rebuild-ids"):
            store.append_to_band_index(batch, t, p)
        assert tools.maintain([p], rebuild_ids=True) is True
        store.append_to_band_index(batch, t, p)  # the retry lands
        assert (
            spark.table(t).select("doc_id").distinct().count()
            == docs.count()
        )
        ids = sorted(
            r["id"] for r in spark.read.parquet(f"{p}/_ids").collect()
        )
        assert ids == sorted(
            r["doc_id"] for r in docs.select("doc_id").collect()
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_rebuild_ids_repairs_crashed_ivf_append(spark, emb, tmp_path, monkeypatch):
    """The ANN twin of the band repair test: kill append_to_ivf_index
    between the sidecar write and the cell assignment, show the loud
    refusal, rebuild the sidecar from the inverted layer, retry green —
    probe results identical to an uninterrupted append."""
    p_ok = str(tmp_path / "ann_ok")
    p = str(tmp_path / "ann")
    old = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    store.write_ivf_index(old, p_ok, n_cells=4, iters=2)
    store.append_to_ivf_index(batch, p_ok)
    store.write_ivf_index(old, p, n_cells=4, iters=2)
    real = S._assign_cells

    def boom(*a, **k):
        raise RuntimeError("simulated executor loss mid-append")

    monkeypatch.setattr(S, "_assign_cells", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        store.append_to_ivf_index(batch, p)
    monkeypatch.setattr(S, "_assign_cells", real)
    with pytest.raises(ValueError, match="rebuild-ids"):
        store.append_to_ivf_index(batch, p)
    store.rebuild_ids_sidecar(spark, p)
    store.append_to_ivf_index(batch, p)  # the retry lands
    q = emb.filter("vec_id < 5")
    assert _rows(
        store.ivf_topk_from_store(spark, q, p, k=3, nprobe=2)
    ) == _rows(store.ivf_topk_from_store(spark, q, p_ok, k=3, nprobe=2))
    ids = {r["id"] for r in spark.read.parquet(f"{p}/_ids").collect()}
    assert ids == {r["vec_id"] for r in emb.select("vec_id").collect()}


def test_append_vs_maintain_single_writer_guard(spark, emb, tmp_path):
    """VERDICT r10 item 6: appends and maintenance on one root race the
    rename swap (an append landing files mid-swap is lost with the
    pre-swap copy) — the implied single-writer contract is now ENFORCED
    by a sibling lock file both paths take. Both directions are
    demonstrated: with maintenance holding the lock, an append fails
    loudly (never silently races); with an append holding it, the
    compaction fails loudly. A provably-dead holder's lock is broken
    immediately (a crashed append must not block a streaming ingest
    loop), and an unprobeable holder's only after a day."""
    import os as _os
    import socket

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t, p = "band_lock_t", str(tmp_path / "band")
    store.write_band_index(docs.filter("doc_id < 400"), t, p)
    try:
        batch = docs.filter("doc_id >= 400")
        local = store._local_index_root(p)
        # maintenance in progress (live holder): the append refuses
        lock = store._acquire_root_lock(local, "compact_band_index")
        with pytest.raises(RuntimeError, match="locked by another writer"):
            store.append_to_band_index(batch, t, p)
        # ...and a second maintenance pass refuses too
        with pytest.raises(RuntimeError, match="locked by another writer"):
            store.compact_band_index(spark, t, p)
        with pytest.raises(RuntimeError, match="locked by another writer"):
            store.rebuild_ids_sidecar(spark, p)
        store._release_root_lock(lock)
        # a crashed writer's lock (host-stamped token, dead pid) is
        # broken immediately — the append proceeds
        dead = f"{socket.gethostname()}-999999999-deadbeef"
        lock_path = _os.path.normpath(local) + store._MAINT_LOCK_SUFFIX
        with open(lock_path, "w") as f:
            f.write(f"{dead} append_to_band_index\n")
        store.append_to_band_index(batch, t, p)
        assert not _os.path.exists(lock_path)  # released after the append
        # an unprobeable (foreign-host) holder is respected until a day old
        with open(lock_path, "w") as f:
            f.write("otherhost-1234-cafe0123 compact_band_index\n")
        with pytest.raises(RuntimeError, match="locked by another writer"):
            store.append_to_band_index(docs.limit(0), t, p)
        day_ago = __import__("time").time() - 90000
        _os.utime(lock_path, (day_ago, day_ago))
        store.compact_band_index(spark, t, p)  # breaks the aged lock
        assert (
            spark.table(t).select("doc_id").distinct().count()
            == docs.count()
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_band_table_name_distinguishes_same_basename_roots(tmp_path):
    """ADVICE r10 (store.py:347): two DIFFERENT roots sharing a basename
    suffix (/a/prod-x1 vs /b/prod-x1) must map to DIFFERENT catalog
    names — otherwise `tools maintain` cannot maintain both in one
    process (the location cross-check refuses the second). Symlinked
    and direct spellings of the SAME root must agree."""
    import os as _os

    a = tmp_path / "a" / "prod-x1"
    b = tmp_path / "b" / "prod-x1"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    na, nb = store.band_table_name(str(a)), store.band_table_name(str(b))
    assert na != nb
    for n in (na, nb):
        assert n.startswith("band_index_x1_")
        import re as _re
        assert _re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", n)
    link = tmp_path / "lnk"
    _os.symlink(tmp_path / "a", link)
    assert store.band_table_name(str(link / "prod-x1")) == na


def test_rebuild_pq_codes_repairs_crashed_codes_half(
    spark, emb, tmp_path, monkeypatch
):
    """VERDICT r11 item 3: an append killed AFTER its inverted write but
    BEFORE its codes write leaves the codes layer missing the batch —
    the retry correctly refuses forever (inverted rows would duplicate)
    and IVF-PQ probes silently miss the batch. `tools maintain
    --rebuild-pq-codes` re-encodes the codes layer from the inverted
    layer: probe results become row-identical to an uninterrupted
    append's, and the codes row set equals the uninterrupted twin's
    exactly (encoding is deterministic per row over the RAW vectors the
    inverted layer stores)."""
    p_ok = str(tmp_path / "ann_ok")
    p = str(tmp_path / "ann")
    batch = emb.filter(F.col("vec_id") >= 250)
    _build_half(emb, p_ok)
    store.append_to_ivf_index(batch, p_ok)
    _build_half(emb, p)
    real = S._subspaces

    def boom(*a, **k):
        raise RuntimeError("simulated executor loss before the codes leg")

    monkeypatch.setattr(S, "_subspaces", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        store.append_to_ivf_index(batch, p)
    monkeypatch.setattr(S, "_subspaces", real)
    # the inverted half landed; the codes half did not
    assert (
        spark.read.parquet(f"{p}/inverted").count() == emb.count()
    )
    assert (
        spark.read.parquet(f"{p}/codes").select("neighbor_id").distinct().count()
        == 250
    )
    # the retry refuses — correctly (re-running would duplicate inverted
    # rows); this crash window is NOT rebuild-ids' to fix
    with pytest.raises(ValueError, match="already present"):
        store.append_to_ivf_index(batch, p)
    store.rebuild_pq_codes(spark, p)
    assert _rows(spark.read.parquet(f"{p}/codes")) == _rows(
        spark.read.parquet(f"{p_ok}/codes")
    )
    q = emb.filter(F.col("vec_id") < 5)
    assert _rows(
        store.ivfpq_topk_from_store(spark, q, p, k=3, nprobe=3)
    ) == _rows(store.ivfpq_topk_from_store(spark, q, p_ok, k=3, nprobe=3))


def test_rebuild_pq_codes_refuses_non_pq_roots(spark, emb, tmp_path):
    """No PQ half (or no meta) -> a loud ValueError, never a partial
    codes dir appearing on an IVF-only store."""
    ivf_only = str(tmp_path / "ivfonly")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 100), ivf_only)
    with pytest.raises(ValueError, match="no PQ half"):
        store.rebuild_pq_codes(spark, ivf_only)
    assert not os.path.isdir(f"{ivf_only}/codes")
    with pytest.raises(ValueError, match="meta sidecar"):
        store.rebuild_pq_codes(spark, str(tmp_path / "nothing"))


def test_lock_wait_rides_out_live_holder(tmp_path):
    """VERDICT r11 item 2: a bounded wait on a LIVE holder — a streaming
    foreachBatch append colliding with a maintenance window can wait the
    compactor out instead of crashing the stream. wait_sec=0 keeps the
    loud immediate refusal; a budget shorter than the holder still
    raises (bounded, not indefinite)."""
    import threading
    import time as _time

    local = str(tmp_path / "root")
    os.makedirs(local)
    lock = store._acquire_root_lock(local, "compact_band_index")
    with pytest.raises(RuntimeError, match="locked by another writer"):
        store._acquire_root_lock(local, "append", wait_sec=0)
    with pytest.raises(RuntimeError, match="locked by another writer"):
        store._acquire_root_lock(local, "append", wait_sec=1.0)
    t = threading.Timer(1.5, store._release_root_lock, args=(lock,))
    t0 = _time.monotonic()
    t.start()
    try:
        got = store._acquire_root_lock(local, "append", wait_sec=30.0)
    finally:
        t.join()
    assert _time.monotonic() - t0 < 25.0  # waited the holder out, not the budget
    store._release_root_lock(got)
    assert not os.path.exists(got)


def test_release_only_unlinks_own_lock(tmp_path):
    """ADVICE r11 (store.py:754): if another process stale-broke our
    lock and re-acquired it, our release must NOT delete the new
    holder's lock — ownership is verified by token before the unlink."""
    local = str(tmp_path / "root")
    os.makedirs(local)
    lock = store._acquire_root_lock(local, "append_to_ivf_index")
    # simulate: a foreign sweeper broke the lock as stale and re-took it
    with open(lock, "w") as f:
        f.write("otherhost-4242-feedface compact_index_partitions\n")
    with pytest.warns(RuntimeWarning, match="not ours"):
        store._release_root_lock(lock)
    assert os.path.exists(lock)  # the new holder's lock survives
    # ADVICE r12: the early-return release paths must not leak our dead
    # token in the registry (our hold is over either way)
    assert str(lock) not in store._HELD_LOCK_TOKENS
    os.remove(lock)
    # the lock-file-already-gone early return drops the entry too
    gone = store._acquire_root_lock(local, "append_to_ivf_index")
    os.remove(gone)  # simulate a sweeper breaking it as stale
    store._release_root_lock(gone)
    assert str(gone) not in store._HELD_LOCK_TOKENS
    # double release: the first pop consumed the token slot, so a
    # second release must leave a waiter's freshly-acquired lock alone
    first = store._acquire_root_lock(local, "append_to_ivf_index")
    store._release_root_lock(first)
    waiter = store._acquire_root_lock(local, "compact_band_index")
    with pytest.warns(RuntimeWarning, match="not ours"):
        store._release_root_lock(first)  # stale double release
    assert os.path.exists(waiter)  # the waiter's lock survives
    store._release_root_lock(waiter)
    assert not os.path.exists(waiter)


def test_maintain_prepass_respects_live_swap_window(
    spark, emb, tmp_path, monkeypatch
):
    """ADVICE r11 (tools.py:622): maintain's recover/sweep pre-pass runs
    under the per-root writer lock. With a live writer mid-swap (lock
    held, live layer momentarily renamed to .old), maintain SKIPS the
    root — it must not rename the .old back into the compactor's rename
    path. Once the writer releases, the same call recovers the crashed
    state."""
    from liq_stream_spark import tools

    monkeypatch.setenv("LIQ_ANN_STORE", str(tmp_path / "store"))
    path = str(tmp_path / "ann")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 100), path)
    # simulate a compactor inside its swap window: lock held, inverted
    # layer renamed away to the .old copy
    lock = store._acquire_root_lock(path, "compact_index_partitions")
    os.rename(f"{path}/inverted", f"{path}/inverted.old.{store._swap_token()}")
    assert tools.maintain([path]) is False  # skipped, reported not-ok
    assert not os.path.isdir(f"{path}/inverted")  # pre-pass did NOT touch it
    store._release_root_lock(lock)
    assert tools.maintain([path]) is True  # recovery restored the layer
    assert spark.read.parquet(f"{path}/inverted").count() == 100


def test_lock_wait_env_and_kwarg_plumb_through(
    spark, emb, tmp_path, monkeypatch
):
    """$LIQ_LOCK_WAIT_SEC is the no-code-change ingest-loop opt-in for
    the bounded wait (wait_sec=None reads it), and append_to_ivf_index's
    lock_wait_sec kwarg reaches the lock: with a maintenance holder
    releasing after ~2 s, a waiting append lands instead of crashing."""
    import threading

    path = str(tmp_path / "ann")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), path)
    # env path on the primitive
    monkeypatch.setenv("LIQ_LOCK_WAIT_SEC", "10")
    held = store._acquire_root_lock(path, "compact_index_partitions")
    t = threading.Timer(1.0, store._release_root_lock, args=(held,))
    t.start()
    try:
        got = store._acquire_root_lock(path, "append")  # waits via env
    finally:
        t.join()
    store._release_root_lock(got)
    monkeypatch.delenv("LIQ_LOCK_WAIT_SEC")
    # kwarg path through a real append
    held = store._acquire_root_lock(path, "compact_index_partitions")
    t = threading.Timer(2.0, store._release_root_lock, args=(held,))
    t.start()
    try:
        store.append_to_ivf_index(
            emb.filter(F.col("vec_id") >= 250), path, lock_wait_sec=60.0
        )
    finally:
        t.join()
    assert spark.read.parquet(f"{path}/inverted").count() == emb.count()


def test_pipeline_sets_default_lock_wait(
    spark, emb, tmp_path, monkeypatch
):
    """VERDICT r12 item 4 (finishing r11 item 2's pipeline half): a
    foreachBatch ingest loop driven by run_pipeline appends to an index
    root and outlasts a concurrent short maintenance pass WITHOUT the
    operator exporting $LIQ_LOCK_WAIT_SEC — run_pipeline raises the
    process-level lock-wait default to ~2x its trigger, and the lock
    acquire falls back to that default when neither the kwarg nor the
    env var is set."""
    import shutil as _shutil
    import threading
    from pathlib import Path

    from liq_stream_spark.sinks import FanOutConfig
    from liq_stream_spark.streaming.pipeline import run_pipeline

    monkeypatch.delenv("LIQ_LOCK_WAIT_SEC", raising=False)
    # patched global -> the raise-only default resets after the test
    monkeypatch.setattr(store, "_DEFAULT_LOCK_WAIT_SEC", 0.0)

    # refuse-fast is still the library contract outside a pipeline
    path = str(tmp_path / "ann")
    store.write_ivf_index(emb.filter(F.col("vec_id") < 250), path)
    held = store._acquire_root_lock(path, "compact_index_partitions")
    with pytest.raises(RuntimeError, match="locked by another writer"):
        store._acquire_root_lock(path, "append_to_ivf_index")

    # a real (drained availableNow) pipeline run raises the default
    fixtures = Path(__file__).parent / "fixtures"
    src = tmp_path / "binance"
    src.mkdir()
    _shutil.copy(fixtures / "binance_force_order.jsonl", src / "b1.jsonl")
    q = run_pipeline(
        spark,
        [("binance", "usdt")],
        {"binance": str(src)},
        FanOutConfig(parquet_path=str(tmp_path / "out")),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=2.0,
        available_now=True,
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    assert store._DEFAULT_LOCK_WAIT_SEC == pytest.approx(4.0)

    # ...and an append under a live maintenance holder releasing within
    # that budget now lands instead of crashing — no env var, no kwarg
    t = threading.Timer(1.0, store._release_root_lock, args=(held,))
    t.start()
    try:
        store.append_to_ivf_index(
            emb.filter(F.col("vec_id") >= 250), path
        )
    finally:
        t.join()
    assert spark.read.parquet(f"{path}/inverted").count() == emb.count()
