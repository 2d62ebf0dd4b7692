"""Query registry.

Every implemented query/operator from SURVEY.md §2 registers itself here
via the ``@query`` decorator; ``__spark_entry__.py`` and the pytest
oracle harness both read this single source of truth.

Contract (per the driver): the Spark callable and the DuckDB oracle SQL
must produce identical column names (the comparator sorts columns by
name before hashing), identical row counts, and value-identical cells
after the declared rounding.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a query. ``oracle`` is equivalent ANSI SQL for DuckDB."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect populates the registry exactly once.
    from wikid_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
