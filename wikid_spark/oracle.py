"""DuckDB-oracle comparator — local mirror of the driver's t2 gate.

Canonicalization matches the driver's description: columns sorted by
name, rows compared order-insensitively, values normalized (floats to a
fixed decimal rendering, timestamps/dates to ISO strings, NULL marker).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb

from wikid_spark.catalog import TABLES


def _default_memory_limit() -> str:
    """min(48GB, ~80% of physical RAM) — a cap above RAM defeats the
    graceful-spill intent (the kernel OOM-kills before DuckDB spills)."""
    import os

    cap_gb = 48
    try:
        phys = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        cap_gb = min(cap_gb, max(1, int(phys * 0.8) // (1 << 30)))
    except (ValueError, OSError, AttributeError):
        pass
    return f"{cap_gb}GB"


def _fresh_spill_dir() -> str:
    """Unique per-connection spill dir, removed at process exit.

    DuckDB temp files use deterministic per-instance names, so concurrent
    processes (tools/certify_auto_large.py shards large-branch certs)
    sharing one fixed temp_directory can collide or delete each other's
    spill files mid-query. mkdtemp isolates each connection; atexit
    cleanup keeps /tmp bounded (compare() opens one connection per call,
    so per-process dir count stays small).
    """
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="wikid_duckdb_spill_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # An IN-MEMORY DuckDB never spills: without a temp_directory the
    # engine holds every operator's working set in RAM up to the 80%
    # default limit — the large-branch oracle diffs at >=20k rows
    # (round-12 certification) grew to ~90 GB and drew the OOM killer.
    # A spill dir + an explicit cap turn that into graceful disk spill;
    # at the sf0.01 test scale neither setting ever engages.
    import os

    con.execute(f"SET temp_directory = '{_fresh_spill_dir()}'")
    con.execute(
        "SET memory_limit = "
        f"'{os.environ.get('WIKID_SPARK_DUCKDB_MEM', _default_memory_limit())}'"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, _decimal.Decimal):
        # Deliberately NOT normalized to int/float: the driver's value
        # hash distinguishes Decimal(123) from 123, so a DuckDB HUGEINT
        # (int128 → decimal128 through Arrow) must fail locally too.
        # Oracles must CAST integer SUMs to BIGINT.
        return f"\x01DEC:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Queries round explicitly; 6 fractional digits absorbs double
        # representation noise without hiding real mismatches.
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize every cell, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Run both sides, return (match, diagnostic)."""
    con = duckdb_connection(sf_dir)
    try:
        # Fetch through Arrow, not fetchall(): fetchall() collapses
        # HUGEINT to Python int and hides the int128-vs-BIGINT typing
        # drift the driver's Arrow-based hash sees (round-1 root cause
        # of all 4 hash mismatches).
        tbl = con.execute(oracle_sql).arrow()
        o_cols = list(tbl.column_names)
        o_rows = [tuple(d[c] for c in o_cols) for d in tbl.to_pylist()]
    finally:
        con.close()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"

    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [
            f"  spark={s} oracle={o}"
            for s, o in zip(s_canon, o_canon)
            if s != o
        ][:5]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
