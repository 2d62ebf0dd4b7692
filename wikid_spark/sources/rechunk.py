"""Landing-zone re-chunking (SURVEY.md §7 'what's hard' (d)).

The real dumps arrive as ONE multi-TB .bz2 file. bz2 is block-
splittable in Hadoop, but a single file still serializes listing,
locality, and commit; every downstream scan of the landing file pays
the same cost. The fix is a one-time landing job: read the dump as
text lines and rewrite it as N similarly-sized files (optionally
recompressed with a splittable-friendly codec), after which every
stage scans with full parallelism and `maxPartitionBytes` granularity.

This is the ONLY place in the engine that calls repartition() on raw
text — everywhere else partitioning falls out of the file layout this
job creates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def rechunk_text(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    n_files: int,
    compression: str | None = None,
) -> None:
    """Rewrite a text dump as ``n_files`` roughly equal files.

    ``n_files`` sizing rule: total_uncompressed_bytes / 128 MiB,
    rounded up — one HDFS-block-ish scan partition per file. The
    shuffle this repartition pays once is what every later stage
    saves."""
    writer = spark.read.text(in_path).repartition(n_files).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(out_dir)
