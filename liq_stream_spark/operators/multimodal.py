"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata (SURVEY.md §2.8).

The Spark-side plumbing — schema, Arrow-batched Pandas UDF signatures,
partition sizing — is real and tested; the codec layer (PIL/ffmpeg/soundfile
are not in this container) is isolated behind ``_decode_*`` functions that
try the real library and otherwise fall back to a deterministic header-based
fake (or raise NotImplementedError for ops that cannot be faked, e.g.
actual pixel resizing).

Scale notes (100 TB of binaries): content stays in parquet binary columns
(or pointers to object storage for >~100 MB assets). Decode runs in
``mapInPandas`` so each Arrow batch amortizes the Python crossing;
``spark.sql.files.maxPartitionBytes`` bounds the per-task working set, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the batch. Feature
extraction emits fixed-width float arrays, so downstream similarity search
(operators/similarity.py) runs JVM-side on the result.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "asset_id long, modality string, format string, width int, height int, "
    "n_bytes long, content_sha256 string"
)

FEATURES_SCHEMA = "asset_id long, feature array<float>"

FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_sha256 string"

_FEATURE_DIM = 16


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def _decode_image_header(content: bytes) -> tuple[str, int, int]:
    """Deterministic stub decode: reads the synthetic 12-byte header
    ``b'FAKE' + <I width + <I height`` produced by synth_assets(); a real
    deployment decodes via PIL (tried first)."""
    pil = _try_pil()
    if pil is not None:
        import io

        try:
            with pil.open(io.BytesIO(content)) as im:
                return im.format or "unknown", im.width, im.height
        except Exception:
            pass
    if len(content) >= 12 and content[:4] == b"FAKE":
        w, h = struct.unpack("<II", content[4:12])
        return "fake", w, h
    return "unknown", 0, 0


def decode_images(df: DataFrame) -> DataFrame:
    """Binary image column -> decoded metadata. mapInPandas: one Python
    crossing per Arrow batch, not per row."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar access, not iterrows(): one Series->list conversion per
        # batch, then plain-Python/C loops over the decoded tuples
        for pdf in batches:
            contents = [bytes(c) if c is not None else b"" for c in pdf["content"]]
            decoded = [_decode_image_header(c) for c in contents]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "format": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "n_bytes": [len(c) for c in contents],
                    "content_sha256": [
                        hashlib.sha256(c).hexdigest() for c in contents
                    ],
                }
            )

    return df.select("asset_id", "modality", "content").mapInPandas(
        op, DECODED_SCHEMA
    )


def image_features(df: DataFrame) -> DataFrame:
    """Binary -> fixed-width float feature vector. The stub derives a
    deterministic pseudo-embedding from the content digest; a real
    deployment swaps in a vision encoder here (same signature, same
    batch shape). Output feeds operators/similarity.py unchanged."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: reshape(0, -1) raises
                continue
            digests = [
                hashlib.sha256(bytes(c) if c is not None else b"").digest()
                for c in pdf["content"]
            ]
            # one frombuffer over the concatenated digests, then a single
            # vectorized scale/shift — identical values to the per-row
            # little-endian uint16 formulation
            mat = (
                np.frombuffer(b"".join(digests), dtype="<u2")
                .reshape(len(digests), -1)[:, :_FEATURE_DIM]
                .astype(np.float64)
                / 65535.0
                - 0.5
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "feature": list(mat),
                }
            )

    return df.select("asset_id", "content").mapInPandas(op, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Pixel resizing needs a real codec; no deterministic fake is honest
    here. The plumbing (signature, schema) is in place — a deployment with
    PIL installed gets the real path."""
    if _try_pil() is None:
        raise NotImplementedError(
            "resize_images requires PIL; not available in this container "
            "(decode/feature/frame-sample have deterministic stubs, pixel "
            "transforms do not)"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        def resize_one(content):
            with Image.open(io.BytesIO(bytes(content))) as im:
                resized = im.resize((width, height))
                buf = io.BytesIO()
                resized.save(buf, format=im.format or "PNG")
            return buf.getvalue()

        for pdf in batches:
            out = pdf.copy()
            out["content"] = [resize_one(c) for c in pdf["content"]]
            yield out

    return df.mapInPandas(op, MULTIMODAL_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every Nth frame of a video asset. The synthetic video layout
    (synth_assets) is a FAKE header + fixed 64-byte frames; a real
    deployment replaces the frame iterator with an ffmpeg/PyAV reader —
    batching and output schema are identical."""

    frame_bytes = 64

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                body = content[12:] if content[:4] == b"FAKE" else content
                n_frames = len(body) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    frame = body[idx * frame_bytes : (idx + 1) * frame_bytes]
                    ids.append(asset_id)
                    idxs.append(idx)
                    hashes.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_sha256": hashes}
            )

    return df.select("asset_id", "content").mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def synth_assets(spark, n: int = 32, seed: int = 7) -> DataFrame:
    """Deterministic synthetic multimodal table for tests: FAKE-header
    binaries with plausible metadata.

    The body is the ASCII sha256 HEXDIGEST of f"{seed}:{i}" repeated to
    768 bytes (not the raw digest): every content byte outside the 12-byte
    header is then valid UTF-8, which lets the m01 oracle rebuild the
    exact byte stream as a DuckDB VARCHAR and reproduce the full decode ->
    sha256 -> feature -> nearest-neighbor pipeline in SQL. The header's
    two <I fields stay raw little-endian bytes; w/h < 128 keeps them
    single-byte codepoints (chr(w) || chr(0)*3) on the SQL side."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
        body_seed = hashlib.sha256(f"{seed}:{i}".encode()).hexdigest().encode()
        body = (body_seed * ((64 * 12) // len(body_seed) + 1))[: 64 * 12]
        content = b"FAKE" + struct.pack("<II", w, h) + body
        rows.append(
            (
                i,
                modality,
                bytearray(content),
                ("fake", w, h, 16000 if modality == "audio" else None,
                 12 if modality == "video" else None),
            )
        )
    return spark.createDataFrame(rows, MULTIMODAL_SCHEMA)
