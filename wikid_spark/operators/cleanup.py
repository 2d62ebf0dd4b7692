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


def clean_deep_templates(df: DataFrame, col: str) -> DataFrame:
    """Finish brace deletion to a true fixpoint on the (rare) rows the
    bounded unroll didn't fully clean. Filter/union split — NOT a
    F.when over a pandas UDF, which would ship every row through
    Python — so the hot path stays whole-stage-codegen'd."""
    # built lazily: the decorator parses the return type against an
    # active session, which doesn't exist at import time
    fixpoint = pandas_udf(_brace_fixpoint_series, StringType())
    resid = F.col(col).rlike(_INNER_PAIR)
    ok = df.filter(~resid)
    tail = df.filter(resid).withColumn(col, fixpoint(F.col(col)))
    return ok.unionByName(tail)
