"""Cross-engine parity tests for functions.detmath — the property the
module exists to guarantee (floor(1e6·ln(a/b)) bit-identical between
Spark and DuckDB) is asserted directly here, not only indirectly via
tx_lm_perplexity's oracle hash.

Round-8 regression context: the round-7 version emitted the atanh
series coefficients as in-SQL decimal divisions (``1.0 / 27.0``),
which Spark evaluates in DECIMAL(8,6) (0.037037) while DuckDB promotes
to DOUBLE (0.037037037037037035) — a ~3e-7 coefficient divergence that
flipped ``lpq`` on ~0.7% of integer-ratio inputs. The grid test below
fails loudly on that bug.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from wikid_spark.functions.detmath import (
    det_ln_ratio_select_sql,
    with_det_ln_ratio,
)


def _duckdb_lpq(pairs):
    """Evaluate the shared stage SQL in DuckDB over (a, b) rows."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(a BIGINT, b BIGINT); "
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    frag = det_ln_ratio_select_sql("a", "b")
    rows = con.execute(
        f"SELECT a, b, lpq FROM (SELECT a, b, {frag} FROM t) ORDER BY a, b"
    ).fetchall()
    con.close()
    return {(a, b): lpq for a, b, lpq in rows}


def _grid_pairs():
    rng = random.Random(0xD37)
    pairs = set()
    # Dense small ratios (the bigram-LM regime: counts are small ints).
    for b in range(1, 64):
        for a in range(1, b + 1):
            pairs.add((a, b))
    # Random medium/large ratios.
    for _ in range(3000):
        b = rng.randrange(1, 10**9)
        a = rng.randrange(1, b + 1)
        pairs.add((a, b))
    # Extremes: a=1, b near 2^53; a=b at scale; adjacent integers.
    big = 2**53 - 1
    pairs |= {
        (1, big),
        (big, big),
        (big - 1, big),
        (1, 2),
        (1, 3),
        (2, 3),
        (10**9, 10**9),
    }
    return sorted(pairs)


@pytest.fixture(scope="module")
def grid():
    return _grid_pairs()


def test_spark_duckdb_bitwise_parity(spark, grid):
    """The whole point: identical lpq bits in both engines, for every
    input — including the dense small-count region where the decimal-
    coefficient bug lived."""
    sdf = spark.createDataFrame(grid, "a long, b long")
    got = {
        (r["a"], r["b"]): r["lpq"]
        for r in with_det_ln_ratio(sdf, "a", "b").collect()
    }
    want = _duckdb_lpq(grid)
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert diffs == {}, f"{len(diffs)} Spark-vs-DuckDB mismatches: " + str(
        dict(list(diffs.items())[:10])
    )


def test_matches_true_floor_within_one(grid):
    """|lpq - floor(1e6·ln(a/b))| <= 1 against Python libm truth;
    EXACT whenever 1e6·ln(a/b) sits safely away (>1e-6 in y units)
    from an integer boundary. Off-by-ones may only occur inside that
    boundary window (the stage chain's ~1e-8 accumulated-rounding
    envelope, widened to 1e-6 here because math.log truth is itself
    only ~1-ulp). A coefficient-level bug (the round-7 decimal
    division produced ~3e-7 RELATIVE error, i.e. y off by whole units
    for large |ln|) fails the exactness branch immediately."""
    lpq = _duckdb_lpq(grid)
    off_by_one = 0
    for (a, b), got in lpq.items():
        y = 1e6 * math.log(a / b)
        true_floor = math.floor(y)
        assert abs(got - true_floor) <= 1, (a, b, got, true_floor)
        boundary_dist = min(y - true_floor, true_floor + 1 - y)
        if got != true_floor:
            off_by_one += 1
            # Only reachable within a hair of an integer boundary.
            assert boundary_dist < 1e-6, (a, b, y, boundary_dist)
    # Sanity: boundary hits are rare on this grid (~1% empirically);
    # a blanket miss rate indicates a structural bug.
    assert off_by_one <= len(lpq) // 25, off_by_one


def test_equal_ratio_edge_pinned():
    """a == b: true value is 0; the deterministic evaluation sits one
    quantum below (-1) because the series result for mm=2 reduced back
    by ln2 lands an ulp under zero. Engine-consistent by construction;
    pinned so a change to the stage chain that moves this edge is
    noticed."""
    same = [(1, 1), (7, 7), (10**6, 10**6), (2**53 - 1, 2**53 - 1)]
    vals = set(_duckdb_lpq(same).values())
    assert vals == {-1}, vals


def test_no_bare_decimal_arithmetic_in_sql():
    """Every numeric literal participating in arithmetic must be CAST
    to DOUBLE — a bare ``1.0 / 27.0`` re-introduces Spark decimal
    division. Guard the generated text."""
    frag = det_ln_ratio_select_sql("a", "b")
    import re

    # Strip CAST(... AS DOUBLE) payloads, then no digit.digit literal
    # may remain outside CAST (integer literals in FLOOR/BIGINT casts
    # and stage names are fine).
    stripped = re.sub(r"CAST\([0-9.e+-]+ AS DOUBLE\)", "", frag)
    assert not re.search(r"\d\.\d", stripped), stripped
