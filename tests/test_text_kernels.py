"""Unit tests for the wikid text kernels (SURVEY.md §5.2).

Each case encodes a behavior of the reference (cited in the kernel
docstrings) — especially the ones that differ from the obvious Spark
built-in (capitalize_first ≠ initcap; nested-template fixpoint).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wikid_spark.functions.text import (
    capitalize_first,
    clean_wikitext,
    extract_links,
    parse_link,
    strip_anchor,
    truncate_on_word,
)


def _one(spark, col, value: str):
    df = spark.createDataFrame([(value,)], ["v"])
    return df.select(col.alias("out")).collect()[0].out


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("new york city", "New york city"),  # only first char — not initcap
        ("NEW YORK", "NEW YORK"),
        ("éclair", "Éclair"),
        ("", ""),
        ("a", "A"),
    ],
)
def test_capitalize_first(spark, raw, expected):
    assert _one(spark, capitalize_first(F.col("v")), raw) == expected


def test_capitalize_first_differs_from_initcap(spark):
    raw = "new york city"
    cap = _one(spark, capitalize_first(F.col("v")), raw)
    ini = _one(spark, F.initcap(F.col("v")), raw)
    assert cap == "New york city" and ini == "New York City" and cap != ini


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Boston#History", "Boston"),
        ("Boston", "Boston"),
        ("a#b#c", "a"),
    ],
)
def test_strip_anchor(spark, raw, expected):
    assert _one(spark, strip_anchor(F.col("v")), raw) == expected


def test_extract_links(spark):
    text = "See [[Boston|the city]] and [[New_York]] plus [[A#sec]]."
    assert _one(spark, extract_links(F.col("v")), text) == [
        "Boston|the city",
        "New_York",
        "A#sec",
    ]


@pytest.mark.parametrize(
    "body,entity,alias",
    [
        ("Boston|the city", "Boston", "the city"),  # explicit alias
        ("New_York", "New York", "New York"),  # no pipe → alias = entity
        ("Boston (Mass.)|", "Boston (Mass.)", "Boston"),  # (spec) rule
        ("A#sec", "A", "A"),  # anchor stripped
        ("Plain|", "Plain", "Plain"),  # empty alias, no paren
    ],
)
def test_parse_link_rules(spark, body, entity, alias):
    out = _one(spark, parse_link(F.col("v")), body)
    assert (out.entity, out.alias) == (entity, alias)


def test_clean_wikitext_nested_templates(spark):
    raw = "Start {{outer {{inner}} more}} end"
    assert _one(spark, clean_wikitext(F.col("v")), raw) == "Start end"


def test_clean_wikitext_chain(spark):
    raw = (
        "'''Bold''' and ''italic'' <!-- gone --> text "
        "[[Category:Cities]] == Heading == <ref name=x>cite</ref> "
        "&lt;tag&gt; &amp; more"
    )
    out = _one(spark, clean_wikitext(F.col("v")), raw)
    assert out == "Bold and italic text <tag> & more"


def test_clean_wikitext_keeps_plain_links(spark):
    raw = "A [[Boston|city]] link"
    assert _one(spark, clean_wikitext(F.col("v")), raw) == "A [[Boston|city]] link"


def test_truncate_on_word(spark):
    raw = "alpha beta gamma delta"
    out = _one(spark, truncate_on_word(F.col("v"), 12), raw)
    # cut at 12 chars = 'alpha beta g' → drop cut word → 'alpha beta'
    assert out == "alpha beta"


def test_truncate_on_word_short_text_untouched(spark):
    raw = "short text"
    assert _one(spark, truncate_on_word(F.col("v"), 1000), raw) == "short text"
