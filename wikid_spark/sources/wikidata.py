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
    # Array-wrapper cleanup (wikidata.py:105-109): the reference trims
    # whitespace, removes exactly ONE trailing comma (clean_line[:-1]
    # guarded by endswith(b',')), THEN keeps lines with len > 1. Single
    # comma, not all: a malformed ',,' line stays malformed and parses
    # to a null row, same as the reference's json.loads failure mode.
    # left()/endswith are codegen'd char ops, no regexp cost.
    body = (
        lines.select(F.trim("value").alias("t"))
        .select(
            F.when(
                F.col("t").endswith(","), F.expr("left(t, length(t) - 1)")
            )
            .otherwise(F.col("t"))
            .alias("raw")
        )
        .filter(F.length("raw") > 1)
    )
    if raw_filter_terms:
        terms = F.array(*[F.lit(t.lower()) for t in raw_filter_terms])
        body = body.filter(
            F.exists(terms, lambda t: F.contains(F.lower("raw"), t))
        )
    # Parse-once barrier (round-11 per-core profile): `from_json` is a
    # CodegenFallback expression, so whole-stage codegen's subexpression
    # elimination does NOT cover it — downstream filters pushed below
    # the projection (F1's type filter, F2's claims predicates, F4's
    # sitelink gate) each re-evaluated the FULL parse per reference,
    # tripling stage-1 wall (8.1 s -> 3.5 s at the 400k-line bench
    # scale). Explode-of-1-element-array is a Generate node: predicates
    # on its OUTPUT cannot push below it and projections cannot inline
    # through it, so every row is parsed exactly once no matter how
    # many columns/predicates consume it. Output rows are identical
    # (a PERMISSIVE null struct explodes to one all-null row, exactly
    # what the un-barriered plan produced).
    return body.select(
        F.explode(F.array(F.from_json("raw", WIKIDATA_SCHEMA))).alias("e")
    ).select("e.*")
