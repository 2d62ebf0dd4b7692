"""Degenerate-corpus sweep: every registered query must run — not
throw — against an EMPTY table set and a SINGLE-ROW table set.

At 100 TB an engine constantly sees empty partitions, empty filter
results, and one-row groups; an operator that divides by a missing
count, calls first() on nothing, or builds an index over zero docs
fails there. The sweep executes each query's full plan (noop-style
collect) on both corpora. Oracle parity is NOT asserted here — the
oracle harness covers value correctness at sf0.01; this certifies
totality on the boundary.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

from wikid_spark.catalog import TABLES
from wikid_spark.registry import all_queries

SRC = "/root/testdata/sf0.001"


def _shrink(out_dir: pathlib.Path, limit: int) -> str:
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        # ORDER BY 1 so the single-row corpus is deterministic.
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"ORDER BY 1 LIMIT {limit}) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out_dir)


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    return _shrink(tmp_path_factory.mktemp("sf_empty"), 0)


@pytest.fixture(scope="session")
def single_sf_dir(tmp_path_factory):
    return _shrink(tmp_path_factory.mktemp("sf_single"), 1)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_degenerate_corpora(spark, empty_sf_dir, single_sf_dir, name):
    spec = all_queries()[name]
    for sf_dir in (empty_sf_dir, single_sf_dir):
        rows = spec.fn(spark, sf_dir).collect()
        assert rows is not None  # ran to completion; emptiness is fine
