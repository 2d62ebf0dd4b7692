"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star training-data pipeline): media travels through the
engine as ``binary`` columns with a typed metadata struct alongside —
the engine never interprets bytes except inside explicitly-vectorized
decode/feature kernels. Those kernels run via ``mapInPandas`` so one
Arrow batch of payloads is handed to the decoder at a time, which is
the shape a real image/audio library (PIL, torchaudio, ffmpeg) wants.

The decode step itself is STUBBED here — the container has no media
libraries. ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake
produces pixels from a hash of the payload. Everything AROUND the stub
— schema, batch iteration, partitioning, output shape — is real and
tested, so swapping in a real decoder is a one-function change.

Scale notes: payload columns dominate row size, so operators here
never shuffle the binary column (feature extraction happens before any
groupBy; metadata-only projections drop the payload as early as
possible). ``spark.sql.files.maxPartitionBytes`` governs scan
parallelism; for multi-GB media blobs store pointers (path + offset)
instead and resolve inside the kernel.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png, wav, mp4, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("meta", MEDIA_META),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_fake_media(
    df: DataFrame,
    id_col: str,
    media_type: str = "image",
    n_frames=None,
) -> DataFrame:
    """Test fixture: deterministic fake payload + metadata per row
    (sha256 of the id, repeated). ``n_frames`` (an int or a Column, for
    the video case) defaults to 1. Real pipelines read payloads from
    object storage via ``spark.read.format('binaryFile')``."""
    idc = F.col(id_col).cast("string")
    payload = F.sha2(idc, 256).cast("binary")
    if n_frames is None:
        frames = F.lit(1)
    elif isinstance(n_frames, int):
        frames = F.lit(n_frames)
    else:
        frames = n_frames.cast("int")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        frames.alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.select(
        idc.alias("doc_id"), payload.alias("payload"), meta.alias("meta")
    )


def _import_pil():
    """Optional-import seam for the real decode path: PIL's Image
    module when the environment ships it, else None (this container
    does not — the deterministic fake remains the tested oracle
    seam). Executor-side call: the import happens inside the kernel,
    per worker process."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE decode: dim floats in [0, 1) derived from a
    hash of the payload. Stands in for pixel/spectrogram features."""
    out = []
    h = payload or b""
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 256.0 for b in h)
    return [float(x) for x in out[:dim]]


def _pil_decode(image_mod, payload: bytes, dim: int) -> list[float]:
    """REAL decode: grayscale-resize the image to ~sqrt(dim)² and
    return the normalized pixels as the feature vector (padded with
    zeros to exactly ``dim``)."""
    import io as _io
    import math

    k = max(1, math.isqrt(dim))
    img = image_mod.open(_io.BytesIO(payload)).convert("L").resize((k, k))
    vals = [v / 255.0 for v in img.getdata()]
    vals = (vals + [0.0] * dim)[:dim]
    return [float(x) for x in vals]


def decode_media(
    media: DataFrame,
    fake: bool = False,
    dim: int = FEATURE_DIM,
    image_module=None,
) -> DataFrame:
    """payload → feature vector via Arrow-batched ``mapInPandas``.

    ``fake=True`` runs the deterministic hash stub (the oracle seam —
    always available, environment-independent). ``fake=False`` routes
    through the REAL decoder: ``image_module`` if given (test seam),
    else PIL resolved by an executor-side optional import
    (`_import_pil`) — and raises NotImplementedError only when neither
    exists (this container ships no codecs). The Spark-side contract
    (schema in/out, batch iteration, payload dropped from the output)
    is identical on every path.
    """

    def decode_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mod = None
        if not fake:
            mod = image_module if image_module is not None else _import_pil()
            if mod is None:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg "
                    "(none importable here); run with fake=True for the "
                    "deterministic stub"
                )
        for pdf in batches:
            if fake:
                feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            else:
                feats = [_pil_decode(mod, p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "meta": pdf["meta"],
                    "features": feats,
                }
            )

    return media.mapInPandas(decode_fn, DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    kept frame index, JVM-side (the payload column is repeated by
    reference, not copied, until a decoder touches it). Zero-frame
    media (n_frames <= 0 or null) samples to no rows — range(0, n)
    semantics, not a spurious frame 0."""
    n = F.col("meta.n_frames")
    idxs = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))
    return media.select(
        "doc_id", "payload", "meta", F.explode(idxs).alias("frame_idx")
    )


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    image_module=None,
) -> DataFrame:
    """Resize plumbing: payload → resized payload with updated meta,
    via the same Arrow-batched mapInPandas contract as decode_media.
    ``fake=True`` passes the payload through unchanged (deterministic
    stand-in); ``fake=False`` routes through the real resizer —
    ``image_module`` if given, else the executor-side PIL import —
    and raises NotImplementedError only when neither exists. Meta
    dimensions update JVM-side on every path, so downstream schema
    logic is real regardless of the decoder."""

    def resize_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mod = None
        if not fake:
            mod = image_module if image_module is not None else _import_pil()
            if mod is None:
                raise NotImplementedError(
                    "real resize requires PIL/ffmpeg (none importable "
                    "here); use fake=True for the pass-through stub"
                )
        for pdf in batches:
            if not fake:
                import io as _io

                def _rz(p: bytes) -> bytes:
                    img = mod.open(_io.BytesIO(p))
                    out = img.resize((width, height))
                    buf = _io.BytesIO()
                    out.save(buf, format=getattr(img, "format", None) or "PNG")
                    return buf.getvalue()

                pdf = pdf.assign(payload=[_rz(p) for p in pdf["payload"]])
            yield pdf

    resized = media.mapInPandas(resize_fn, MEDIA_SCHEMA)
    new_meta = F.struct(
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.format").alias("format"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )
    return resized.select("doc_id", "payload", new_meta.alias("meta"))
