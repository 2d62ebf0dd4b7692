"""Training-data export sink: sharded, size-bounded JSONL.

The standard interchange format a tokenizer/trainer consumes is
newline-delimited JSON in many similar-sized shard files. Two knobs
matter at 100 TB: shard COUNT (one task per shard → write parallelism)
and records-per-file (keeps any single file streamable). Compression is
a codec name away; the layout logic is identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shards: int,
    shard_key: str | None = None,
    max_records_per_file: int = 0,
    compression: str | None = None,
) -> None:
    """Write ``df`` as ``shards`` JSONL files under ``path``.

    ``shard_key`` repartitions by hash of that column so related rows
    co-locate in a shard (e.g. all chunks of a document, so a reader
    streams them together); otherwise round-robin for uniform sizes.
    ``max_records_per_file`` > 0 additionally splits oversized shards —
    the writer-level guard repartition alone can't give."""
    out = (
        df.repartition(shards, F.col(shard_key))
        if shard_key
        else df.repartition(shards)
    )
    w = out.write.mode("overwrite")
    if max_records_per_file > 0:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
