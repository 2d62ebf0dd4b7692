"""Downstream KB-dataset consumer (SURVEY.md §3.3; create_kb.py in
/root/reference/scripts/).

The reference loads entity profiles, coalesces a description fallback,
embeds descriptions with spaCy (its only intra-stage parallelism:
nlp.pipe n_process), then serializes a spaCy KnowledgeBase + a CSV of
(qid, description). Re-expressed:

* description fallback (A9, create_kb.py:35-44) — one coalesce.
* embedding inference (U3) — an Arrow-batched pandas UDF behind a
  PLUGGABLE encoder. The container ships no embedding model, so the
  default encoder is a deterministic hash-based fake with the real
  kernel shape: batch of strings in → fixed-dim float vectors out.
  Swapping in sentence-transformers/spaCy is one closure; the model
  loads once per executor (lazy init inside the UDF), never on the
  driver, never per row.
* sinks: Parquet for the KB dataset, CSV for the (qid, description)
  export (S7, create_kb.py:89-95). The pickled-KB artifact (S8) stays
  a driver-side export by nature — `kb_artifact_rows` returns the
  collected rows a caller would feed to spaCy's KnowledgeBase; the
  engine's job ends at the DataFrame.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

EMBED_DIM = 64


def fake_encoder(texts: list[str], dim: int = EMBED_DIM) -> list[list[float]]:
    """DETERMINISTIC FAKE embedding model: unit-norm-ish vectors from
    sha256 of the text. Stands in for nlp.pipe / sentence encoders."""
    out = []
    for t in texts:
        h = (t or "").encode()
        vals: list[float] = []
        while len(vals) < dim:
            h = hashlib.sha256(h).digest()
            vals.extend((b - 127.5) / 127.5 for b in h)
        out.append([float(x) for x in vals[:dim]])
    return out


def with_description_fallback(profiles: DataFrame) -> DataFrame:
    """A9: description ← first non-null of (description, first 200
    chars of article_text, name) (create_kb.py:35-44)."""
    return profiles.withColumn(
        "description",
        F.coalesce(
            F.col("description"),
            F.substring("article_text", 1, 200),
            F.col("name"),
        ),
    )


def spacy_encoder(
    model: str = "en_core_web_md",
) -> Callable[[list[str]], list[list[float]]]:
    """U3 real-model seam: the reference embeds descriptions with spaCy
    ``nlp.pipe`` (create_kb.py:46-56). Returns a batch encoder for
    ``embed_descriptions``. The import is lazy (optional dependency) and
    the model loads once per executor Python worker — the closure cache
    survives across Arrow batches, so the reference's ``n_process`` pool
    becomes Spark partition parallelism with per-worker model reuse.

    Raises ImportError/OSError on a box without spaCy or the model;
    callers (and the optional-import test) skip in that case.
    """
    import spacy  # deferred: not a dependency of the engine itself

    cache: dict[str, object] = {}

    def enc(texts: list[str]) -> list[list[float]]:
        if "nlp" not in cache:
            cache["nlp"] = spacy.load(model)
        return [
            [float(x) for x in doc.vector] for doc in cache["nlp"].pipe(texts)
        ]

    return enc


def hashed_bow_encoder(
    dim: int = EMBED_DIM,
) -> Callable[[list[str]], list[list[float]]]:
    """U3 vendored real encoder: hashed bag-of-words ("hashing trick",
    Weinberger et al. 2009) with L2 normalization. A genuine
    content-dependent embedding — tokens hash to buckets with a
    hash-derived sign, so similar texts get high cosine and disjoint
    texts get near-zero — with zero external dependencies, so the
    real-encoder seam (reference create_kb.py:46-56) is exercised in
    every environment, not only where spaCy + a model are installed.

    Deterministic: hashing uses zlib.crc32, stable across processes and
    Python versions (unlike builtin hash())."""
    import re
    import zlib

    # \w is Unicode-aware in Python 3, so non-Latin scripts tokenize to
    # real tokens instead of embedding to the all-zero vector.
    token_re = re.compile(r"\w+")

    def enc(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            vec = [0.0] * dim
            for tok in token_re.findall((t or "").lower()):
                h = zlib.crc32(tok.encode())
                vec[h % dim] += 1.0 if (h >> 31) & 1 == 0 else -1.0
            norm = sum(x * x for x in vec) ** 0.5
            out.append([x / norm for x in vec] if norm else vec)
        return out

    return enc


def embed_descriptions(
    profiles: DataFrame,
    encoder: Callable[[list[str]], list[list[float]]] | None = None,
) -> DataFrame:
    """U3: add an ``embedding: array<float>`` column for ``description``
    via mapInPandas. ``encoder`` maps a batch of strings to vectors;
    defaults to the deterministic fake. Executor-parallel — the
    reference's n_process pool becomes partition parallelism."""
    enc = encoder or fake_encoder
    cols = profiles.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in profiles.schema.fields
    ) + ", embedding array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = enc(pdf["description"].fillna("").tolist())
            pdf = pdf.assign(embedding=vecs)
            yield pdf

    return profiles.mapInPandas(run, out_schema).select(*cols, "embedding")


def write_description_csv(profiles: DataFrame, path: str) -> None:
    """S7: (qid, description) CSV export (create_kb.py:89-95)."""
    (
        profiles.select("qid", "description")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def kb_artifact_rows(kb_dataset: DataFrame):
    """S8 boundary: the rows a spaCy KnowledgeBase build would consume
    (driver-side by nature — serializing a pickled KB is not a
    distributed concern). Kept separate so nothing else collects."""
    return kb_dataset.select(
        "qid", "name", "embedding", "aliases", "count"
    ).collect()
