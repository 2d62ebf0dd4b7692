"""The shared lifecycle of an EVOLVING on-disk index.

`streaming.dedup_ingest` (LSH over text shingles) and
`streaming.vector_ingest` (IVF cells over embeddings) are the same
machine with different (sign, probe) kernels. This module is that
machine, extracted so both — and any future index type (SimHash bands,
trained-centroid serving, FTS postings) — inherit one crash/replay
contract instead of re-implementing it:

* **Layout**: each index component lives under
  ``{index_dir}/{part}/batch_id=N`` directories. The corpus base is
  ``batch_id=-1`` (`BASE_BATCH_ID`); each streamed micro-batch appends
  under its own ``batch_id=n``.
* **Replay idempotency**: a batch's appends and its verdict output are
  written in OVERWRITE mode to paths deterministic in ``batch_id`` —
  an at-least-once replayed batch rewrites its own output
  byte-identically instead of duplicating it.
* **Read-your-own-writes with deterministic replay**: batch n's probe
  reads index state strictly ``batch_id < n`` — it sees every earlier
  batch's kept rows, never its own half-written state, and replays
  compute identical verdicts.
* **Compaction**: `compact_index_parts` folds base + deltas back into
  ``batch_id=-1`` with a heal-preamble + two-rename swap that leaves a
  recoverable tree at every crash point (both index suites
  regression-test the crash states through this one implementation).

The kernels a concrete index plugs in:

* ``sign(rows, index_dir) -> {part: (DataFrame, partition_cols)}`` —
  the component rows a set of corpus/batch rows contributes. Receives
  ``index_dir`` because signing may consult frozen side state (the
  vector index's centroid table).
* ``probe(spark, batch, index_dir, as_of_batch) -> DataFrame`` — the
  per-batch verdicts (must include the id column and a ``verdict``
  column with 'keep'/'drop').
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BASE_BATCH_ID = -1

SignFn = Callable[[DataFrame, str], dict]
ProbeFn = Callable[[SparkSession, DataFrame, str, "int | None"], DataFrame]


_SIDECAR = "_part_schema.json"


def _write_schema_sidecar(df: DataFrame, part_batch_dir: str) -> None:
    """Record the component's data schema next to its files. A
    DEGENERATE write — an empty corpus under partitionBy emits ZERO
    data files — leaves nothing for read-time inference; the sidecar
    lets `read_part` recover the schema without the caller hand-
    maintaining one per component (round 16: the vector index's
    ``cells`` dtype follows the corpus embedding type, so no single
    literal schema string can be correct for every corpus)."""
    from wikid_spark.fsutil import _fs_write_text

    _fs_write_text(
        df.sparkSession, f"{part_batch_dir}/{_SIDECAR}", df.schema.json()
    )


def write_part(
    df: DataFrame,
    index_dir: str,
    part: str,
    batch_id: int,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """One component under its ``batch_id`` directory — overwrite mode
    (the replay-idempotency half of the contract)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    out = f"{index_dir}/{part}/batch_id={batch_id}"
    w.parquet(out)
    _write_schema_sidecar(df, out)


def read_part(
    spark: SparkSession,
    index_dir: str,
    part: str,
    as_of_batch: int | None,
    schema: str | None = None,
) -> DataFrame:
    """One component across base + appended deltas. With
    ``as_of_batch`` set, reads strictly earlier partitions — partition
    pruning on ``batch_id``, and the probe's replay determinism.
    ``schema`` (must include ``batch_id int``) lets a DEGENERATE
    component — an empty corpus partitionBy-writes zero data files —
    load where inference would fail (the persist_ann_index explicit-
    schema lesson); without it, the write-time schema sidecar serves
    the same purpose for dtype-variable components."""
    reader = spark.read.option("basePath", f"{index_dir}/{part}")
    if schema is None:
        sidecar = _read_schema_sidecar(spark, index_dir, part)
        if sidecar is not None:
            reader = reader.schema(sidecar)
    else:
        reader = reader.schema(schema)
    df = reader.parquet(f"{index_dir}/{part}/batch_id=*")
    if as_of_batch is not None:
        df = df.filter(F.col("batch_id") < as_of_batch)
    return df.drop("batch_id")


def _read_schema_sidecar(spark: SparkSession, index_dir: str, part: str):
    """StructType (+ the batch_id partition col) from any batch dir's
    sidecar, or None when no sidecar exists (pre-round-16 trees:
    inference proceeds as before)."""
    import json

    from pyspark.sql.types import IntegerType, StructField, StructType

    from wikid_spark.fsutil import _fs_list_names, _fs_read_text

    base = f"{index_dir}/{part}"
    for name in _fs_list_names(spark, base):
        if not name.startswith("batch_id="):
            continue
        path = f"{base}/{name}/{_SIDECAR}"
        try:
            st = StructType.fromJson(json.loads(_fs_read_text(spark, path)))
        except Exception:
            continue
        return st.add(StructField("batch_id", IntegerType()))
    return None


def persist_index(sign: SignFn, corpus: DataFrame, index_dir: str) -> None:
    """Build the corpus base: every signed component under
    ``batch_id=-1`` so streaming appends evolve the same tree."""
    for part, (df, pcols) in sign(corpus, index_dir).items():
        write_part(df, index_dir, part, BASE_BATCH_ID, pcols)


def append_kept(
    sign: SignFn,
    batch: DataFrame,
    kept_ids: DataFrame,
    id_col: str,
    index_dir: str,
    batch_id: int,
) -> None:
    """Append the kept rows' signatures under this batch's partitions —
    overwrite mode, so a replayed batch rewrites its own appends
    byte-identically instead of duplicating them."""
    kept = batch.join(F.broadcast(kept_ids), id_col, "left_semi")
    for part, (df, pcols) in sign(kept, index_dir).items():
        write_part(df, index_dir, part, batch_id, pcols)


def verdict_batch_writer(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    probe: ProbeFn,
    sign: SignFn,
    id_col: str,
    evolve: bool = True,
    checkpoint_batch: bool = False,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: probe → write verdicts under
    ``batch_id=<n>`` (overwrite → exactly-once under Structured
    Streaming's sequential-batch contract) → append the kept rows'
    signatures so later batches dedup against them. ``evolve=False``
    probes the static corpus-only base instead (as_of_batch=None).

    ``checkpoint_batch=True`` eagerly localCheckpoints the incoming
    batch and the verdicts so the append step reuses materialized rows
    (the vector index's multi-use batch); False re-reads the kept ids
    from the just-written verdict parquet (the LSH index's disk-backed
    equivalent — no executor-heap copy of the batch)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        b = batch.localCheckpoint(eager=True) if checkpoint_batch else batch
        v = probe(spark, b, index_dir, batch_id if evolve else None)
        if checkpoint_batch:
            v = v.localCheckpoint(eager=True)
        out = f"{out_dir}/batch_id={batch_id}"
        v.write.mode("overwrite").parquet(out)
        if evolve:
            kept_src = v if checkpoint_batch else spark.read.parquet(out)
            kept_ids = kept_src.filter(F.col("verdict") == "keep").select(
                id_col
            )
            append_kept(sign, b, kept_ids, id_col, index_dir, batch_id)

    return write_batch


def read_verdict_log(
    spark: SparkSession, out_dir: str, cols: tuple[str, ...]
) -> DataFrame:
    """All verdicts appended so far (one row per streamed record)."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(f"{out_dir}/batch_id=*")
        .select(*cols)
    )


def compact_index_parts(
    spark: SparkSession,
    index_dir: str,
    parts: tuple[str, ...],
    partition_cols: tuple[str, ...] = (),
    schema: str | None = None,
) -> None:
    """The crash-safe fold, per component: heal-preamble, write the
    fold to ``.compacting``, two-rename swap. ``partition_cols``
    optionally re-partition-by columns inside the folded base (the
    vector index keeps ``cent_id`` directory pruning).

    Crash-safety: the folded component is written to a SIBLING
    directory first (a disk materialization — no heap-resident
    localCheckpoint of corpus-scale data), then swapped in with two
    renames. At no point is the only copy in memory; a crash leaves
    either the old tree, or old+new side by side (``.old`` /
    ``.compacting``), or — in the instant between the two renames —
    only ``.old`` (+ a fully-written ``.compacting``). Re-running
    compaction heals every state: the preamble restores a missing
    ``live`` from ``.old`` (preferred — it was the live tree) or from
    a COMPLETE ``.compacting`` (its ``_SUCCESS`` marker present)
    BEFORE any deletion, so no crash point leaves zero surviving
    copies. On object storage the renames map to the store's
    atomic-commit primitive."""
    import os
    import shutil

    for part in parts:
        live = f"{index_dir}/{part}"
        tmp = f"{index_dir}/{part}.compacting"
        old = f"{index_dir}/{part}.old"
        if not os.path.exists(live):
            # Crash landed between rename(live, old) and rename(tmp,
            # live): restore first, delete only after live exists again.
            if os.path.exists(old):
                os.rename(old, live)
            elif os.path.exists(
                f"{tmp}/batch_id={BASE_BATCH_ID}/_SUCCESS"
            ):
                os.rename(tmp, live)
            else:
                raise FileNotFoundError(
                    f"index component {live} missing and neither "
                    f"{old} nor a complete {tmp} exists to restore it"
                )
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        folded = read_part(spark, index_dir, part, None, schema=schema)
        if partition_cols:
            # One file per partition directory: without the repartition
            # every read task writes its own fragment into every
            # directory, and the serve scan pays per-file open cost
            # instead of one footer per probed directory (the
            # persist_ann_index one-file-per-cell lesson, round 11).
            folded = folded.repartition(*partition_cols)
        writer = folded.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(f"{tmp}/batch_id={BASE_BATCH_ID}")
        _write_schema_sidecar(folded, f"{tmp}/batch_id={BASE_BATCH_ID}")
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old, ignore_errors=True)
