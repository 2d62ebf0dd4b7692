"""Tests for the KB-dataset consumer (§3.3) and demo-dump extraction (S9)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wikid_spark.plans import kb
from wikid_spark.sources.demo_extract import (
    extract_wikidata_demo,
    extract_wikipedia_demo,
)
from wikid_spark.sources.wikipedia import read_wikipedia_pages


@pytest.fixture(scope="module")
def profiles(spark):
    rows = [
        ("Q1", "Alpha", ["Alpha", "A"], 3, "a thing", "Alpha", "alpha text " * 40),
        ("Q2", "Beta", ["Beta"], 1, None, "Beta", "beta article text here"),
        ("Q3", "Gamma", ["Gamma"], 0, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "qid string, name string, aliases array<string>, count bigint, "
        "description string, article_title string, article_text string",
    )


def test_description_fallback(profiles):
    got = {
        r["qid"]: r["description"]
        for r in kb.with_description_fallback(profiles).collect()
    }
    assert got["Q1"] == "a thing"  # own description wins
    assert got["Q2"] == "beta article text here"  # article fallback
    assert got["Q3"] == "Gamma"  # name fallback
    # article fallback truncates at 200 chars (create_kb.py:40)
    assert all(len(v) <= 200 or k == "Q1" for k, v in got.items())


def test_embed_descriptions(profiles):
    ds = kb.embed_descriptions(kb.with_description_fallback(profiles))
    rows = ds.collect()
    assert ds.schema["embedding"].dataType.simpleString() == "array<float>"
    for r in rows:
        assert len(r["embedding"]) == kb.EMBED_DIM
    # deterministic: same description → same vector
    again = kb.embed_descriptions(kb.with_description_fallback(profiles))
    assert [r["embedding"] for r in rows] == [r["embedding"] for r in again.collect()]
    # pluggable encoder is honored
    const = kb.embed_descriptions(
        profiles, encoder=lambda ts: [[1.0, 2.0] for _ in ts]
    )
    assert const.first()["embedding"] == [1.0, 2.0]


def test_encoder_seam_real_model(profiles):
    """U3 seam: a REAL (content-dependent) encoder drops into
    embed_descriptions unchanged. Prefers spaCy when installed (the
    reference's encoder, create_kb.py:46-56); otherwise exercises the
    vendored hashed bag-of-words encoder — either way the real path
    runs, no environment skips."""
    try:
        # Probe availability with a THROWAWAY encoder, then hand
        # embed_descriptions a fresh one whose cache is still empty —
        # the kb module pickles by value, so a pre-loaded cache would
        # ship the whole spaCy pipeline to executors and defeat the
        # lazy per-executor load design.
        kb.spacy_encoder("en_core_web_sm")(["probe"])
        enc = kb.spacy_encoder("en_core_web_sm")
    except (ImportError, OSError):
        enc = kb.hashed_bow_encoder(dim=64)
    ds = kb.embed_descriptions(
        kb.with_description_fallback(profiles), encoder=enc
    )
    row = ds.first()
    assert row["embedding"] is not None and len(row["embedding"]) > 0


def test_hashed_bow_encoder_properties():
    """The vendored encoder is a real embedding: deterministic,
    content-sensitive, L2-normalized, and cosine-orders similar texts
    above dissimilar ones."""
    enc = kb.hashed_bow_encoder(dim=64)
    a1, a2, b, empty = enc(
        [
            "quick brown fox jumps high",
            "quick brown fox leaps high",
            "parliament ratified maritime treaty yesterday",
            "",
        ]
    )
    assert a1 == enc(["quick brown fox jumps high"])[0]  # deterministic
    for v in (a1, a2, b):
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # unit norm
    assert empty == [0.0] * 64

    def cos(u, v):
        return sum(x * y for x, y in zip(u, v))

    assert cos(a1, a2) > cos(a1, b) + 0.2  # similarity structure


def test_encoder_seam_batch_contract(profiles):
    """The seam's contract (list[str] -> list[list[float]], one vector
    per input, any dim) holds for an arbitrary third-party callable —
    this is what makes the real-model test above a drop-in."""
    def enc(texts):
        # vector depends on the input → proves per-row encoding happened
        return [[float(len(t or "")), 1.5] for t in texts]

    ds = kb.embed_descriptions(kb.with_description_fallback(profiles), encoder=enc)
    got = {r["qid"]: r["embedding"] for r in ds.collect()}
    assert got["Q1"] == [float(len("a thing")), 1.5]
    assert got["Q3"] == [float(len("Gamma")), 1.5]
    assert len(got) == 3


def test_csv_sink_and_artifact_rows(profiles, tmp_path, spark):
    ds = kb.embed_descriptions(kb.with_description_fallback(profiles))
    out = str(tmp_path / "csv")
    kb.write_description_csv(ds, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3 and set(back.columns) == {"qid", "description"}
    rows = kb.kb_artifact_rows(ds)
    assert {r["qid"] for r in rows} == {"Q1", "Q2", "Q3"}


def test_wikidata_demo_extract_roundtrip(spark, tmp_path):
    src = tmp_path / "dump.ndjson"
    src.write_text(
        "[\n"
        '{"id":"Q60","type":"item","labels":{"en":{"value":"New York"}}},\n'
        '{"id":"Q64","type":"item","labels":{"en":{"value":"Berlin"}}},\n'
        "]\n"
    )
    out = str(tmp_path / "out")
    extract_wikidata_demo(spark, str(src), out, ["new york"])
    kept = spark.read.text(out).collect()
    assert len(kept) == 1 and "Q60" in kept[0]["value"]
    # output re-reads through the normal reader
    from wikid_spark.sources.wikidata import read_wikidata_dump

    assert read_wikidata_dump(spark, out).select("id").first()["id"] == "Q60"


def test_wikipedia_demo_extract_roundtrip(spark, tmp_path):
    xml = tmp_path / "dump.xml"
    xml.write_text(
        "<mediawiki>"
        "<page><title>Keep</title><id>1</id>"
        "<revision><id>9</id><text>kept [[x]]</text></revision></page>"
        "<page><title>Drop</title><id>2</id>"
        "<revision><id>8</id><text>dropped</text></revision></page>"
        "</mediawiki>"
    )
    pages = read_wikipedia_pages(spark, str(xml))
    titles = spark.createDataFrame([("Keep",)], "name string")
    out = str(tmp_path / "out")
    extract_wikipedia_demo(pages, titles, out)
    back = read_wikipedia_pages(spark, out).collect()
    assert len(back) == 1
    assert back[0]["title"] == "Keep" and back[0]["raw_text"] == "kept [[x]]"
