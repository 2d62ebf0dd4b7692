"""Scalar-function layer: string / date / math / array / json / explode.

Q17–Q22 from SURVEY.md §2.1 — every expression is a built-in
pyspark.sql.functions call (JVM-side, whole-stage codegen); nothing in
this module leaves the JVM.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wikid_spark.catalog import table
from wikid_spark.functions.text import capitalize_first
from wikid_spark.registry import query


@query(
    "q17_string_functions",
    oracle="""
    SELECT
      p_partkey,
      UPPER(p_name) AS name_upper,
      LOWER(p_type) AS type_lower,
      SUBSTRING(p_name, 1, 5) AS name_prefix,
      UPPER(SUBSTRING(p_name, 1, 1)) || SUBSTRING(p_name, 2) AS name_capfirst,
      REPLACE(p_type, ' ', '_') AS type_underscored,
      TRIM(p_name) AS name_trimmed,
      LENGTH(p_name) AS name_len,
      (p_name LIKE '%old%') AS has_old,
      split_part(p_name, ' ', 1) AS first_token,
      REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowels
    FROM part
    ORDER BY p_partkey
    LIMIT 500
    """,
    tags=("scalar", "string"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel battery [X1, X2, X5, X9, X10] incl. the reference's
    capitalize-first (≠ initcap, wikipedia.py:246-256)."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            capitalize_first("p_name").alias("name_capfirst"),
            F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_underscored"),
            F.trim("p_name").alias("name_trimmed"),
            F.length("p_name").alias("name_len"),
            F.col("p_name").contains("old").alias("has_old"),
            F.substring_index("p_name", " ", 1).alias("first_token"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@query(
    "q18_date_functions",
    oracle="""
    SELECT
      o_custkey,
      CAST(MIN(o_orderdate) AS DATE) AS first_order,
      CAST(MAX(o_orderdate) AS DATE) AS last_order,
      EXTRACT(YEAR  FROM MIN(o_orderdate)) AS first_year,
      EXTRACT(MONTH FROM MIN(o_orderdate)) AS first_month,
      EXTRACT(DAY   FROM MIN(o_orderdate)) AS first_day,
      CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS first_month_start,
      (EXTRACT(YEAR FROM MAX(o_orderdate)) - EXTRACT(YEAR FROM MIN(o_orderdate))) * 12
        + (EXTRACT(MONTH FROM MAX(o_orderdate)) - EXTRACT(MONTH FROM MIN(o_orderdate)))
        AS months_span
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    LIMIT 500
    """,
    tags=("scalar", "date"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kernel battery: casts, extracts, date_trunc, month span.
    Month span is explicit (y*12+m) arithmetic — months_between has
    engine-specific fractional semantics, so we avoid it for parity."""
    o = table(spark, sf_dir, "orders")
    mn, mx = F.min("o_orderdate"), F.max("o_orderdate")
    return (
        o.groupBy("o_custkey")
        .agg(
            mn.cast("date").alias("first_order"),
            mx.cast("date").alias("last_order"),
            F.year(mn).cast("long").alias("first_year"),
            F.month(mn).cast("long").alias("first_month"),
            F.dayofmonth(mn).cast("long").alias("first_day"),
            F.date_trunc("month", mn).cast("date").alias("first_month_start"),
            ((F.year(mx) - F.year(mn)) * 12 + (F.month(mx) - F.month(mn)))
            .cast("long")
            .alias("months_span"),
        )
        .orderBy("o_custkey")
        .limit(500)
    )


@query(
    "q19_math_functions",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(l_extendedprice, 0) AS price_rounded,
      ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
      CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
      CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
      ROUND(LN(1 + l_extendedprice), 4) AS price_ln,
      ROUND(SQRT(l_quantity), 4) AS qty_sqrt,
      ROUND(POWER(l_discount, 2), 4) AS disc_sq,
      l_orderkey % 7 AS key_mod
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 500
    """,
    tags=("scalar", "math"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel battery [A5-adjacent]: round/abs/ceil/floor/ln/sqrt/
    power/mod, integer-cast where engines' return types differ."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 0).alias("price_rounded"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
            F.floor("l_extendedprice").cast("long").alias("price_floor"),
            F.round(F.log(F.lit(1) + F.col("l_extendedprice")), 4).alias("price_ln"),
            F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
            F.round(F.pow("l_discount", 2), 4).alias("disc_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


@query(
    "q20_array_functions",
    oracle="""
    SELECT
      doc_id,
      len(string_split(text, ' ')) AS n_words,
      string_split(text, ' ')[1] AS first_word,
      string_split(text, ' ')[-1] AS last_word,
      list_contains(string_split(text, ' '), 'spark') AS has_spark,
      array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab
    FROM documents
    ORDER BY doc_id
    LIMIT 200
    """,
    tags=("scalar", "array"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernel battery [X1, X8, A6]: split, size, element access,
    membership, sorted-distinct join (the A6 set-union-agg shape)."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(words).alias("n_words"),
            words.getItem(0).alias("first_word"),
            F.element_at(words, -1).alias("last_word"),
            F.array_contains(words, "spark").alias("has_spark"),
            F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("vocab"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "q21_json_functions",
    oracle="""
    SELECT
      event_type,
      -- outer CAST: DuckDB SUM(BIGINT) is HUGEINT → driver hash-mismatch
      CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
      ROUND(AVG(CAST(props ->> 'k' AS BIGINT)), 4) AS k_avg
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalar", "json"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction [X6, X7] — get_json_object on the untyped props
    column (the reference stores claims as JSON TEXT, wikidata.py:233;
    internally we keep data typed and only parse at the boundary)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("k_sum"),
            F.round(F.avg(k), 4).alias("k_avg"),
        )
        .orderBy("event_type")
    )


@query(
    "q22_explode_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("scalar", "explode", "skew"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/unnest word count [X8, U2] — the A1 prior-count shape
    with Zipfian skew. Partial aggregation combines hot words map-side
    before the shuffle, and AQE splits skewed reducers; the reference's
    equivalent is an unbounded driver dict (wikipedia.py:28,197-201)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )
