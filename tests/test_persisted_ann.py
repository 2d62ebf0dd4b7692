"""Persisted, cell-partitioned batch ANN serving (round 11).

The round-10 scale audit's one structural caveat: the in-plan batch
``sim_*`` queries bound candidate COMPUTE by the probe budget but still
scan the full index column. `persist_ann_index` +
`serve_persisted_topk` close that — the index persists partitioned by
cent_id and the serve's scan partition-prunes to the probed cells.
These tests pin (a) result identity with the in-plan twin, (b) the
PartitionFilters in the physical plan, and (c) the actual file-level
pruning (inputFiles reads only probed cell directories).
"""

from __future__ import annotations

import glob
import os

import wikid_spark.queries.similarity as S

SF = "/root/testdata/sf0.001"


def _build(spark, tmp_path):
    out = str(tmp_path / "ann_index")
    spec = S.persist_ann_index(spark, SF, out, spec=S.PQ8)
    return out, spec


def test_persist_writes_committed_artifacts(spark, tmp_path):
    out, spec = _build(spark, tmp_path)
    assert spec == S.PQ8
    assert os.path.exists(os.path.join(out, S._INDEX_OK))
    assert S.load_ann_index_spec(out) == S.PQ8
    cents = spark.read.parquet(f"{out}/centroids")
    assert cents.count() == S.derived_k(
        S.corpus_rows(SF, "embeddings")
    )
    cb = spark.read.parquet(f"{out}/codebooks")
    assert cb.count() <= S.PQ8.subs * S.PQ8.codes
    # the index is directory-partitioned on cent_id — the pruning unit
    cells = glob.glob(os.path.join(out, "rindex", "cent_id=*"))
    assert len(cells) > 1
    rindex = spark.read.parquet(f"{out}/rindex")
    assert rindex.count() == S.corpus_rows(SF, "embeddings")
    assert set(S.PQ8.cols) <= set(rindex.columns)


def test_persisted_serve_matches_in_plan_twin(spark, tmp_path):
    """Results must be identical to the in-plan all-dials query
    (sim_ivfpq8_residual_np4_topk) — same training, same serve tail;
    only the scan changes."""
    out, _ = _build(spark, tmp_path)
    got = sorted(
        tuple(r)
        for r in S.serve_persisted_topk(
            spark, SF, out, nprobe=4, spec=S.PQ8
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in S.sim_ivfpq8_residual_np4_topk(spark, SF).collect()
    )
    assert got == want and len(got) > 0


def test_persisted_serve_scan_is_partition_pruned(spark, tmp_path):
    """The 100 TB IO claim, plan- and file-pinned: the rindex scan
    carries a cent_id PartitionFilter, and the files the serve reads
    from the index are EXACTLY the probed cells' directories — a
    probe-budget-bounded subset, not the corpus."""
    out, _ = _build(spark, tmp_path)
    df = S.serve_persisted_topk(spark, SF, out, nprobe=1, spec=S.PQ8)
    # plan toString truncates long metadata (Location, PartitionFilters)
    # at 100 chars by default — widen for the assertion
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert "PartitionFilters: [cent_id" in plan, plan[:4000]

    # Directory-level: nprobe=1 over the ≤40-query sample probes at
    # most |queries| distinct cells; the scan's partition filter must
    # name EXACTLY those cells (Catalyst prunes the file listing to
    # them — inputFiles() can't show this; it is pruning-blind).
    emb = S.table(spark, SF, "embeddings")
    sample = S._sample_filter(
        emb.select(
            "vec_id",
            S.quantize_embedding(S.F.col("embedding")).alias("qemb"),
        )
    )
    cents = spark.read.parquet(f"{out}/centroids")
    probed = {
        r["cent_id"]
        for r in S._assign_blas(sample, cents, top_m=1)
        .select("cent_id")
        .distinct()
        .collect()
    }
    import re

    # ≤10 literals render as IN (…), larger lists as INSET …
    m = re.search(
        r"PartitionFilters: \[cent_id#\d+L? IN(?:SET)? \(?([0-9, ]+)", plan
    )
    assert m, plan[:4000]
    filtered_cells = {int(x) for x in m.group(1).split(",")}
    total_cells = len(glob.glob(os.path.join(out, "rindex", "cent_id=*")))
    assert filtered_cells == probed
    assert len(filtered_cells) < total_cells


def test_ensure_persisted_index_caches_and_is_idempotent(spark):
    d1 = S._ensure_persisted_index(spark, SF, S.PQ8)
    assert os.path.exists(os.path.join(d1, S._INDEX_OK))
    d2 = S._ensure_persisted_index(spark, SF, S.PQ8)
    assert d1 == d2
