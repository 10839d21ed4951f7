"""Multimodal plumbing tests: schemas, Arrow batch shapes, deterministic
stub codecs, and the similarity handoff."""

import pytest

from liq_stream_spark.operators import multimodal as MM
from liq_stream_spark.operators.similarity import cosine_topk


def test_decode_images(spark):
    assets = MM.synth_assets(spark, n=12)
    out = MM.decode_images(assets)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 12
    assert rows[0]["format"] == "fake" and rows[0]["width"] == 16
    assert rows[1]["width"] == 20 and rows[1]["height"] == 16
    assert all(len(r["content_sha256"]) == 64 for r in rows.values())
    # determinism: same synth content -> same digest on re-run
    again = {r["asset_id"]: r for r in MM.decode_images(assets).collect()}
    assert all(
        rows[i]["content_sha256"] == again[i]["content_sha256"] for i in rows
    )


def test_image_features_feed_similarity(spark):
    assets = MM.synth_assets(spark, n=12)
    feats = MM.image_features(assets)
    first = feats.collect()
    assert all(len(r["feature"]) == 16 for r in first)
    # features are a first-class embedding column: similarity ops run on them
    renamed = feats.withColumnRenamed("asset_id", "vec_id").withColumnRenamed(
        "feature", "embedding"
    )
    topk = cosine_topk(renamed.filter("vec_id < 3"), renamed, k=3)
    got = topk.collect()
    assert len(got) == 9  # 3 queries x top-3
    assert all(r["rank"] in (1, 2, 3) for r in got)


def test_frame_sample(spark):
    assets = MM.synth_assets(spark, n=6)
    frames = MM.frame_sample(assets, every_n=5)
    got = frames.collect()
    # 12 fake frames per asset, sampled at 0,5,10 -> 3 per asset x 6 assets
    assert len(got) == 18
    assert sorted({r["frame_idx"] for r in got}) == [0, 5, 10]


def test_resize_requires_codec(spark):
    assets = MM.synth_assets(spark, n=2)
    if MM._try_pil() is None:
        with pytest.raises(NotImplementedError):
            MM.resize_images(assets, 8, 8)
    else:
        out = MM.resize_images(assets, 8, 8)
        assert out.schema == MM.MULTIMODAL_SCHEMA


def test_malformed_binary(spark):
    rows = [(0, "image", bytearray(b"not an image"), None),
            (1, "image", None, None)]
    df = spark.createDataFrame(rows, MM.MULTIMODAL_SCHEMA)
    got = {r["asset_id"]: r for r in MM.decode_images(df).collect()}
    assert got[0]["format"] == "unknown" and got[0]["width"] == 0
    assert got[1]["n_bytes"] == 0


def test_synth_assets_bytes_match_independent_spec(spark):
    """The m01 oracle rebuilds synth_assets' exact bytes in DuckDB SQL, so
    the byte layout is contract: FAKE + <I w + <I h + ASCII hexdigest of
    '7:<i>' repeated to 768 bytes. Pin it against hashlib/struct directly
    so a synth change can't silently diverge from the oracle."""
    import hashlib
    import struct

    rows = {r["asset_id"]: r for r in MM.synth_assets(spark, n=5).collect()}
    for i in range(5):
        w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
        body = (hashlib.sha256(f"7:{i}".encode()).hexdigest().encode() * 13)[
            : 64 * 12
        ]
        expected = b"FAKE" + struct.pack("<II", w, h) + body
        assert bytes(rows[i]["content"]) == expected
        assert all(b < 128 for b in bytes(rows[i]["content"])[12:])
