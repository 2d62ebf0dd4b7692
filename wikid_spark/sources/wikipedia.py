"""Wikipedia XML dump source (SURVEY.md S2).

The reference assembles ``<page>`` records with a hand-rolled
line-level state machine (wikipedia.py:302-422 in
/root/reference/scripts/wiki/), including a rule that the article id is
the first ``<id>`` encountered *outside* a ``<revision>`` scope
(wikipedia.py:408-416). Spark-first re-expression: the built-in XML
data source (``rowTag="page"``) — record assembly is handled by the
input format across split boundaries, so a 100 TB dump re-chunked into
block-sized files parallelizes without any custom grouping. The
revision-scope rule falls out of structure: the page-level ``id``
element IS the struct field ``id``; the revision's own ``<id>`` lives
at ``revision.id`` and is never confused with it.

Ids are read as strings: the reference's dev-split predicate is a
*string* ``endswith("3")`` (wikipedia.py:655-662) and ids must round-
trip exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

PAGE_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("id", StringType()),
        StructField(
            "revision",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("text", StringType()),
                ]
            ),
        ),
    ]
)


def read_wikipedia_pages(spark: SparkSession, path: str) -> DataFrame:
    """Raw XML dump file(s) → ``(title, article_id, raw_text)``.

    ``raw_text`` is the revision wikitext (markup intact); downstream
    stages clean it (functions.text.clean_wikitext) and extract links
    (operators.annotate).
    """
    pages = (
        spark.read.format("xml")
        .option("rowTag", "page")
        .schema(PAGE_SCHEMA)
        .load(path)
    )
    return pages.select(
        "title",
        F.col("id").alias("article_id"),
        F.col("revision.text").alias("raw_text"),
    )


def is_dev(col) -> Column:
    """Deterministic ~10% dev split: string article_id ends with '3'
    (wikipedia.py:655-662). NULL/empty id → not dev (same as reference's
    falsy guard)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.endswith("3"), F.lit(False))
