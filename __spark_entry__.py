"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship profile query (SURVEY.md Q04 — the
reference's entity-profile join+agg shape, __init__.py:150-179) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from the wikid_spark registry.

Ordering note: the driver's CORRECTNESS file records the first 50
entries of ``queries()`` iteration order per round. To converge on a
driver-green row for *every* registered query across rounds,
``queries()`` lists driver-unconfirmed queries first (no hash-green row
in any ``CORRECTNESS_r*.json`` yet — including queries added this
round), then previously-confirmed ones for re-confirmation, each group
in registration order.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession

from wikid_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["q04_profile_join_agg"].fn(spark, "/root/testdata/sf0.001")


def _last_confirmed_round() -> dict[str, int]:
    """Per query: latest round number with a green row in CORRECTNESS_r*.json."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path)
        try:
            rnd = int(stem[len("CORRECTNESS_r") : -len(".json")])
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            green = row.get("hash_match") is True or (
                "hash_match" not in row and row.get("rows_match") is True
            )  # second form: rows-only check (no oracle_sql entry)
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered_specs():
    """Never-confirmed queries first, then stalest-confirmed, then freshest."""
    specs = all_queries()
    last = _last_confirmed_round()
    reg_index = {n: i for i, n in enumerate(specs)}
    ordered = sorted(specs, key=lambda n: (last.get(n, -1), reg_index[n]))
    return {n: specs[n] for n in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
