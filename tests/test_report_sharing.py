"""Round-11 recall-report serving-pass sharing: the multi-depth
helpers must be OUTPUT-IDENTICAL to the registered single-depth plans
they replace inside `sim_recall_report` (the report's oracle pins the
end-to-end values; these pin the helpers directly, per depth)."""

from __future__ import annotations

import wikid_spark.queries.similarity as S

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_trained_probe_multi_matches_single_depth_plans(spark):
    trained = S._trained_index(spark, SF)
    multi = S._trained_probe_topk_multi(*trained)
    assert set(multi) == {1, 2, 4}
    for np_ in (1, 2, 4):
        want = _rows(S._trained_probe_topk(*trained, nprobe=np_))
        got = _rows(multi[np_])
        assert got == want and len(got) > 0, f"nprobe={np_}"


def test_residual_serve_multi_matches_single_depth_plans(spark):
    idx = S._residual_index(spark, SF, spec=S.PQ4)
    multi = S._residual_serve_multi(spark, SF, idx, nprobes=(2, 4))
    assert set(multi) == {2, 4}
    for np_ in (2, 4):
        want = _rows(
            S._ivfpq_residual_plan(spark, SF, nprobe=np_, idx=idx)
        )
        got = _rows(multi[np_])
        assert got == want and len(got) > 0, f"nprobe={np_}"


def test_trained_index_memoized_per_corpus(spark, tmp_path):
    """Round-13: `_trained_index` trains once per (application, corpus
    fingerprint) — same session + same corpus returns the SAME frames;
    a content change (fingerprint) retrains; results are identical
    either way (training is deterministic)."""
    import shutil

    S._TRAINED_INDEX_CACHE.clear()
    first = S._trained_index(spark, SF)
    again = S._trained_index(spark, SF)
    assert all(a is b for a, b in zip(first, again))

    # identical corpus content at a DIFFERENT path/mtime -> different
    # fingerprint -> fresh (but value-identical) training
    alt = tmp_path / "alt_sf"
    alt.mkdir()
    for t in ("embeddings", "documents"):
        shutil.copy(f"{SF}/{t}.parquet", alt / f"{t}.parquet")
    other = S._trained_index(spark, str(alt))
    assert other[1] is not first[1]
    assert _rows(other[1]) == _rows(first[1])  # K-row centroids equal
