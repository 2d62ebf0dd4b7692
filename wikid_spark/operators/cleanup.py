"""X3 fixpoint tail: exact deep-template parity for clean_wikitext.

The reference loops innermost-brace deletion until the text stops
shrinking (/root/reference/scripts/wiki/wikipedia.py:526-537).
``clean_wikitext`` unrolls TEMPLATE_UNROLL levels as JVM regexes —
enough for real wikitext and it keeps the whole chain in codegen — but
a page nested deeper would keep brace residue. This operator finishes
the job for exactly that tail: rows still holding a removable innermost
pair are split off and run through an Arrow-batched pandas fixpoint;
everything else never leaves the JVM.

An unmatched lone brace is NOT residue: the reference's loop cannot
remove it either (its pattern needs a pair), so both engines keep it.
"""

from __future__ import annotations

import re
import sys

import pandas as pd
import pyspark.sql.functions as F
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Innermost pair: same match set as the reference's lazy `{[^{]*?}` —
# both stop at the first '}' and admit no '{' in the content.
_INNER_PAIR = r"\{[^{}]*\}"
_INNER_PAIR_RE = re.compile(_INNER_PAIR)


def _fix_one(t):
    if t is None:
        return t
    prev = None
    while prev != t:
        prev, t = t, _INNER_PAIR_RE.sub("", t)
    # deletions can open double spaces after the chain's collapse
    # already ran; re-collapse + strip like the chain's tail
    return re.sub(" +", " ", t).strip()


def _brace_fixpoint_series(s: pd.Series) -> pd.Series:
    return s.map(_fix_one)


cloudpickle.register_pickle_by_value(sys.modules[__name__])


def expression_barrier(df: DataFrame) -> DataFrame:
    """Explode-of-1-element-array Generate barrier over every column:
    consumers above it read materialized fields instead of inlining
    the expression trees that produced them (collapsed projections
    re-evaluate a referenced expression once PER REFERENCE — the
    round-11 wikidata parse profile and the round-12 prior-pass/
    article-pass profiles all traced their stage walls to exactly
    this). Row-preserving: one input row → one output row, same
    columns, same values."""
    return df.select(
        F.explode(F.array(F.struct(*df.columns))).alias("_b")
    ).select("_b.*")


def clean_deep_templates(df: DataFrame, col: str) -> DataFrame:
    """Finish brace deletion to a true fixpoint on the (rare) rows the
    bounded unroll didn't fully clean.

    Shape (round 12): one pass over an `expression_barrier` — NOT the
    previous filter/union split, whose two branches each re-executed
    the whole upstream subtree (scan + clean_wikitext chain) and whose
    filters inlined the chain again per predicate (~4 chain
    evaluations per row; measured as the bulk of the article stage
    wall). The pandas fixpoint still only does real work on residual
    rows: its INPUT is `when(resid, col)` — NULL for already-clean
    rows, so the Arrow batch is a null-heavy column and the Python
    kernel's None fast-path returns immediately — and the outer
    `when` keeps the JVM-computed text for clean rows. One scan, one
    chain evaluation, no union.

    Row contract (round 13, pinned by test): rows where `col` IS NULL
    are PRESERVED with NULL — `rlike` on NULL is NULL, so `_resid` is
    falsy and the otherwise-branch passes the NULL through. The
    pre-round-12 filter/union shape silently DROPPED such rows (both
    NULL-predicate filters excluded them); preservation is the
    intended semantics — a cleanup operator must not change the row
    set. (The production caller filters null raw_text upstream, so
    this only matters for direct operator use.)"""
    # built lazily: the decorator parses the return type against an
    # active session, which doesn't exist at import time
    fixpoint = pandas_udf(_brace_fixpoint_series, StringType())
    bar = expression_barrier(
        df.withColumn("_resid", F.col(col).rlike(_INNER_PAIR))
    )
    resid = F.col("_resid")
    fixed = fixpoint(F.when(resid, F.col(col)))
    return bar.withColumn(
        col, F.when(resid, fixed).otherwise(F.col(col))
    ).drop("_resid")
