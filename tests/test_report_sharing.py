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
