"""Filtered dump re-writer (SURVEY.md S9, J4; demo extraction).

The reference builds its test fixtures by copying only matching
entities/pages from the full dumps to a new dump of the SAME format
(wikidata.py:273-321, wikipedia.py:435-483 in
/root/reference/scripts/wiki/). Re-expressed as filter + same-format
write:

* wikidata: the cheap substring pre-filter runs on RAW lines before
  any JSON parse (F11 — the reference's ordering, preserved
  structurally), then matching lines are written back as text. Output
  is a valid NDJSON dump (no array wrapper — our reader accepts both).
* wikipedia: pages whose title is in the entity-label set (semi-join
  J4) are written back with the XML writer (rowTag=page), so the
  output re-reads through sources.wikipedia unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def extract_wikidata_demo(
    spark: SparkSession, in_path: str, out_path: str, filter_terms: list[str]
) -> None:
    """Copy raw dump lines containing any filter term (lowercased
    containment — wikidata.py:303-313) to a new NDJSON dump."""
    lines = spark.read.text(in_path)
    body = lines.filter(F.length(F.trim("value")) > 1).select(
        F.regexp_replace(F.trim("value"), ",$", "").alias("value")
    )
    terms = F.array(*[F.lit(t.lower()) for t in filter_terms])
    kept = body.filter(F.exists(terms, lambda t: F.contains(F.lower("value"), t)))
    kept.write.mode("overwrite").text(out_path)


def extract_wikipedia_demo(
    pages: DataFrame, titles: DataFrame, out_path: str
) -> None:
    """Keep pages whose title ∈ the entity-title set (left-semi J4,
    wikipedia.py:471) and re-write them as a page-per-row XML dump."""
    kept = pages.join(
        F.broadcast(titles.select(F.col("name").alias("title"))),
        "title",
        "left_semi",
    )
    (
        kept.select(
            "title",
            F.col("article_id").alias("id"),
            F.struct(F.col("raw_text").alias("text")).alias("revision"),
        )
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "mediawiki")
        .option("rowTag", "page")
        .save(out_path)
    )
