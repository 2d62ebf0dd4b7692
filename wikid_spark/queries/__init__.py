"""Declared query set (SURVEY.md §2.1) + extensions.

Importing this package populates ``wikid_spark.registry``.
"""

from wikid_spark.queries import (  # noqa: F401
    dedup,
    extensions,
    fts,
    pipeline,
    relational,
    scalars,
    similarity,
    textstats,
    windows,
)
