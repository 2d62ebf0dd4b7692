"""Multimodal plumbing tests: schema, batch shape, determinism, stub gate.

The decode itself is a deterministic fake (no media libs in the
container); what these tests pin down is the Spark-side contract —
exactly what a real decoder would slot into.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from wikid_spark.catalog import table
from wikid_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = table(spark, SF, "documents").limit(50)
    return mm.attach_fake_media(docs, "doc_id").cache()


def test_media_schema(media):
    # simpleString ignores nullability flags (computed cols are non-null)
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    r = media.first()
    assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) > 0
    assert r["meta"]["media_type"] == "image"


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        mm.decode_media(media, fake=False).collect()


def test_fake_decode_shape_and_determinism(media):
    out = mm.decode_media(media, fake=True)
    assert out.schema.simpleString() == mm.DECODED_SCHEMA.simpleString()
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["features"])
    # payload column must NOT survive into the decoded output
    assert "payload" not in out.columns
    # deterministic across runs
    again = {r["doc_id"]: r["features"] for r in mm.decode_media(media, fake=True).collect()}
    assert {r["doc_id"]: r["features"] for r in rows} == again


def test_frame_sampling(spark, media):
    video = media.withColumn(
        "meta",
        F.col("meta").withField("n_frames", F.lit(25)).withField(
            "media_type", F.lit("video")
        ),
    )
    frames = mm.sample_frames(video, every_n=10)
    per_doc = frames.groupBy("doc_id").count().collect()
    # frames 0, 10, 20 → 3 per doc
    assert all(r["count"] == 3 for r in per_doc)
    idxs = sorted(
        r["frame_idx"] for r in frames.filter(F.col("doc_id") == per_doc[0]["doc_id"]).collect()
    )
    assert idxs == [0, 10, 20]


def test_frame_sampling_zero_frames_emits_no_rows(spark):
    # range(0, n) semantics: n_frames=0 (or null) → no sampled frames,
    # not a spurious frame 0.
    docs = spark.range(4).withColumnRenamed("id", "doc_id")
    media = mm.attach_fake_media(docs, "doc_id", media_type="video").withColumn(
        "meta",
        F.col("meta").withField(
            "n_frames",
            F.when(F.col("doc_id") == "0", F.lit(0))
            .when(F.col("doc_id") == "1", F.lit(None).cast("int"))
            .otherwise(F.lit(5)),
        ),
    )
    out = mm.sample_frames(media, every_n=10)
    got = {r["doc_id"]: r["frame_idx"] for r in out.collect()}
    assert got == {"2": 0, "3": 0}


def test_attach_fake_media_accepts_plain_int_n_frames(spark):
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    media = mm.attach_fake_media(docs, "doc_id", media_type="video", n_frames=7)
    assert all(r["meta"]["n_frames"] == 7 for r in media.collect())


def test_resize_media_updates_meta_and_keeps_schema(spark):
    from wikid_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        attach_fake_media,
        resize_media,
    )

    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    media = attach_fake_media(docs, "doc_id")
    out = resize_media(media, 32, 32, fake=True)
    # same field names and types (nullability flags differ for literals)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in MEDIA_SCHEMA.fields
    ]
    rows = out.collect()
    assert all(r["meta"]["width"] == 32 and r["meta"]["height"] == 32 for r in rows)
    # fake path is a pass-through: payload bytes unchanged
    orig = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert all(bytes(r["payload"]) == orig[r["doc_id"]] for r in rows)


def test_resize_media_real_path_raises(spark):
    import pytest as _pytest
    from pyspark.errors import PythonException

    from wikid_spark.operators.multimodal import attach_fake_media, resize_media

    docs = spark.range(2).withColumnRenamed("id", "doc_id")
    out = resize_media(attach_fake_media(docs, "doc_id"), 8, 8, fake=False)
    with _pytest.raises(PythonException, match="NotImplementedError"):
        out.collect()


# The fake PIL classes below ride into the executor kernels; workers
# can't import the test module, so it must pickle by value.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


class _FakeImage:
    """PIL-Image-shaped stand-in: 'pixels' derive from the payload so
    assertions can predict the decode output."""

    format = "PNG"

    def __init__(self, payload: bytes, size=(8, 8)):
        self.payload = payload
        self.size = size

    def convert(self, mode):
        return self

    def resize(self, size):
        return _FakeImage(self.payload, size)

    def getdata(self):
        w, h = self.size
        base = (self.payload or b"\x00")[0]
        return [(base + i) % 256 for i in range(w * h)]

    def save(self, buf, format=None):
        w, h = self.size
        buf.write(b"RESIZED:%dx%d:" % (w, h) + (self.payload or b""))


class _FakePIL:
    """PIL.Image-module-shaped seam object (cloudpickled by value into
    the kernel)."""

    @staticmethod
    def open(bio):
        return _FakeImage(bio.read())


def test_decode_media_real_path_via_injected_module(spark):
    """fake=False with an injected image module must run the REAL
    decode path: grayscale-resize to sqrt(dim)^2 and emit normalized
    pixels — verifying the PIL plumbing (open -> convert -> resize ->
    getdata -> /255) without PIL in the container."""
    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    media = mm.attach_fake_media(docs, "doc_id")
    out = mm.decode_media(media, fake=False, image_module=_FakePIL)
    rows = {r["doc_id"]: r["features"] for r in out.collect()}
    assert set(rows) == {"1", "2"}
    payloads = {
        r["doc_id"]: bytes(r["payload"]) for r in media.collect()
    }
    import math

    k = math.isqrt(mm.FEATURE_DIM)
    for doc_id, feats in rows.items():
        assert len(feats) == mm.FEATURE_DIM
        base = payloads[doc_id][0]
        want = [((base + i) % 256) / 255.0 for i in range(k * k)]
        want = (want + [0.0] * mm.FEATURE_DIM)[: mm.FEATURE_DIM]
        assert [round(f, 5) for f in feats] == [round(w, 5) for w in want]


def test_resize_media_real_path_via_injected_module(spark):
    """fake=False resize with the injected module rewrites the payload
    through open -> resize -> save and still updates meta JVM-side."""
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = mm.attach_fake_media(docs, "doc_id")
    orig = bytes(media.collect()[0]["payload"])
    out = mm.resize_media(media, 32, 16, fake=False, image_module=_FakePIL)
    r = out.collect()[0]
    assert bytes(r["payload"]) == b"RESIZED:32x16:" + orig
    assert (r["meta"]["width"], r["meta"]["height"]) == (32, 16)
    # schema unchanged (names/types; lit() meta fields lose nullability)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema] == [
        (f.name, f.dataType.simpleString()) for f in media.schema
    ]


def test_import_pil_returns_none_here():
    """The container ships no PIL — the seam must say so (and the
    fake=False default path therefore raises, covered above)."""
    assert mm._import_pil() is None
