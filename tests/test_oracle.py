"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This is the local mirror of the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from wikid_spark.oracle import compare
from wikid_spark.registry import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    if spec.oracle is None:
        # Weaker rows-only check (mirrors driver behavior for non-SQL ops).
        assert df.count() >= 0
        return
    ok, diag = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {diag}"
