"""Every registered query must be RUN-DETERMINISTIC: two executions on
the same session and data produce identical rows.

This is the regression net for the keeper-selection class of bug (a
`dropDuplicates` survivor or an unordered `first()` is plan-dependent
and can flip between runs/partitionings — the round-3 verdict's
`wikipedia_articles` finding). The driver's oracle hash-compare only
catches nondeterminism when it happens to disagree with DuckDB on the
checked run; this asserts the property directly.

sf0.001 keeps the sweep cheap; determinism is a per-plan property, not
a data-scale one.
"""

from __future__ import annotations

import pytest

from wikid_spark.registry import all_queries

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_rerun_identical(spark, name):
    fn = all_queries()[name].fn
    first = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    second = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    assert first == second
