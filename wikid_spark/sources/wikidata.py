"""Wikidata NDJSON dump source (SURVEY.md S1, F11).

The reference streams the bz2 dump line-by-line, strips the JSON-array
wrapper commas, and json.loads each line (wikidata.py:96-111 in
/root/reference/scripts/wiki/). Spark-first re-expression:
``spark.read.text`` (bz2 decompresses transparently; for a 100 TB
landing zone, re-chunk the single dump file into many files first so
scans parallelize) → wrapper-comma cleanup with ``regexp_replace`` →
``from_json`` against an explicit typed schema.

Two scale-critical properties preserved from the reference:

* **Filter-before-parse** (wikidata.py:303-313): an optional cheap
  substring predicate runs on the raw line *before* ``from_json``.
  Catalyst will not hoist a filter above the parse it references, so
  the ordering is expressed structurally here.
* **Typed nested schema**: claims stay `map<string, array<struct>>`
  end-to-end — no stringified JSON internally. Snak values that are
  scalars rather than `{id: ...}` objects parse to NULL structs in
  PERMISSIVE mode, which matches the reference's
  ``isinstance(cp_dict, dict)`` guard (wikidata.py:155-160).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_VALUE = StructType([StructField("id", StringType())])
_SNAK = StructType(
    [StructField("datavalue", StructType([StructField("value", _VALUE)]))]
)
CLAIM = StructType(
    [StructField("mainsnak", _SNAK), StructField("rank", StringType())]
)
_TITLE = StructType([StructField("title", StringType())])
_LANGVAL = StructType([StructField("value", StringType())])

WIKIDATA_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("claims", MapType(StringType(), ArrayType(CLAIM))),
        StructField("sitelinks", MapType(StringType(), _TITLE)),
        StructField("labels", MapType(StringType(), _LANGVAL)),
        StructField("descriptions", MapType(StringType(), _LANGVAL)),
        StructField("aliases", MapType(StringType(), ArrayType(_LANGVAL))),
    ]
)


def read_wikidata_dump(
    spark: SparkSession,
    path: str,
    raw_filter_terms: list[str] | None = None,
) -> DataFrame:
    """Raw dump file(s) → typed entity DataFrame.

    ``raw_filter_terms``: optional lowercase substrings tested against
    the raw line before parsing (the reference's demo-extraction
    pre-filter, wikidata.py:287-313). Keeps the parse off lines that
    can't match — at 100 TB this is the difference between scanning
    bytes and building JSON trees for the full corpus.
    """
    lines = spark.read.text(path)
    # Array-wrapper cleanup: drop '['/']' lines, strip trailing commas
    # (wikidata.py:106-108).
    body = lines.filter(F.length(F.trim("value")) > 1).select(
        F.regexp_replace(F.trim("value"), ",$", "").alias("raw")
    )
    if raw_filter_terms:
        terms = F.array(*[F.lit(t.lower()) for t in raw_filter_terms])
        body = body.filter(
            F.exists(terms, lambda t: F.contains(F.lower("raw"), t))
        )
    return body.select(
        F.from_json("raw", WIKIDATA_SCHEMA).alias("e")
    ).select("e.*")
