"""Opt-in sf1 compute-spread certification (verdict r14 #6).

The round-13 catalog spread (`catalog.table` / `spread_for_compute`)
took the CPU-dense kernel family 8-11x at sf1 by un-serializing
1-2-split scans (SCALE.md round 13, measured tables). Those A/Bs
lived only in ad-hoc drills; this test mechanizes the invariant so a
future regression — the spread silently not firing, or a
KEY-redistribution shuffle creeping under the kernels — is caught.

Skipped by default (the r12 `WIKID_SPARK_SCALE_CERT` pattern): needs
the /tmp/scale/sf1 corpus, regenerated with
``python tools/gen_sf.py /root/testdata/sf0.1 /tmp/scale/sf1 10``.
Wall bounds are deliberately GENEROUS (5-10x the measured post-spread
walls): they only exist to blow up on the serialized single-task
shape, which measured 10-25x the spread walls in the r13 drill — not
to flake on host speed.
"""

from __future__ import annotations

import os
import time

import pytest

from wikid_spark.registry import all_queries

SF1 = "/tmp/scale/sf1"

pytestmark = pytest.mark.skipif(
    "WIKID_SPARK_SCALE_CERT" not in os.environ,
    reason="opt-in: sf1 spread certification needs /tmp/scale/sf1 "
    "(tools/gen_sf.py factor 10 over sf0.1) and minutes of wall",
)


def _noop_wall(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf1_present():
    if not os.path.isdir(SF1):
        pytest.skip(
            "no /tmp/scale/sf1 corpus — run "
            "`python tools/gen_sf.py /root/testdata/sf0.1 /tmp/scale/sf1 10`"
        )
    return SF1


def test_sf1_documents_scan_is_spread(spark, sf1_present):
    """At sf1 the documents/embeddings files still plan fewer splits
    than the 32 cores, so the catalog spread must FIRE (roundrobin in
    the plan) — and it must stay the round-robin kind, never a
    key-redistribution of the scan."""
    from wikid_spark import catalog as C

    for name in ("documents", "embeddings"):
        df = C.table(spark, SF1, name)
        plan = _executed_plan(df)
        assert "roundrobin" in plan.lower(), name
        assert "hashpartitioning" not in plan.lower(), name


def test_sf1_signature_pass_spread_and_bounded(spark, sf1_present):
    """The full-corpus minhash signature pass — the kernel the r13
    profile found pinned to ONE task (31 cores idle, 10.4x after the
    spread). Plan: spread fires, no KEY redistribution below the
    signature aggregation's own (legitimate) doc_id shuffle."""
    from wikid_spark.catalog import table
    from wikid_spark.queries.dedup import signature_row_from

    sig = signature_row_from(
        table(spark, SF1, "documents").select("doc_id", "text")
    )
    plan = _executed_plan(sig)
    assert "roundrobin" in plan.lower()
    wall = _noop_wall(sig)
    # r13 measured ~9 s post-spread / ~94 s serialized at sf1
    assert wall < 60, f"signature pass took {wall:.0f}s — spread regressed?"


def test_sf1_ngram_jaccard_bounded(spark, sf1_present):
    """nd_ngram_jaccard at sf1: r13 measured 23-29 s with the spread
    vs 255-295 s serialized. Bound sits between the two regimes."""
    df = all_queries()["nd_ngram_jaccard"].fn(spark, SF1)
    wall = _noop_wall(df)
    assert wall < 150, f"nd_ngram_jaccard took {wall:.0f}s — spread regressed?"


def test_sf1_ann_brute_bounded(spark, sf1_present):
    """sim_ann_brute_topk at sf1: 8.5x from the spread in the r13
    drill (the brute-force cosine kernel is pure CPU)."""
    df = all_queries()["sim_ann_brute_topk"].fn(spark, SF1)
    plan = _executed_plan(df)
    assert "roundrobin" in plan.lower()
    wall = _noop_wall(df)
    assert wall < 120, f"sim_ann_brute_topk took {wall:.0f}s — spread regressed?"


def test_sf1_round15_retrieval_bounded(spark, sf1_present):
    """Round-15 additions at sf1, bounded against their measured
    shapes (SCALE.md "Round 15: new-query sf1 drill" table:
    hybrid-multi 12.36 s pre-matmul-rewrite — the rewrite only
    lowered it — mmr-multi 0.46 s, hard-neg-ann 1.76 s, fts-serve
    0.48 s; sim_mmr_ann_multi measured 1.7 s in the sf10 drill, so
    its sf1 bound is generous a fortiori — bounds are 5-10x to
    only blow up on a regressed SHAPE, e.g. a lost broadcast turning
    the per-anchor candidate agg all-pairs, or a lost partition filter
    scanning every bucket)."""
    specs = all_queries()
    for name, bound in (
        ("fts_hybrid_rrf_multi", 75),
        ("sim_mmr_multi", 15),
        ("sim_hard_negatives_ann_topk", 20),
        ("fts_serve_persisted", 10),
        ("sim_mmr_ann_multi", 20),
    ):
        df = specs[name].fn(spark, SF1)
        wall = _noop_wall(df)
        assert wall < bound, f"{name} took {wall:.0f}s at sf1 (bound {bound}s)"
