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
