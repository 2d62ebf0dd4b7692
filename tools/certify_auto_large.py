"""Certify the auto-serving entries' scale-gated oracles END TO END.

Every driver/local correctness run diffs the auto entries at sf0.01
(500 embeddings), so the `_scale_gated_oracle` union's LARGE arm —
selected at n >= PQ_WIDTH_THRESHOLD = 20,000 — always evaluated to zero
rows in those runs (round-11 verdict "What's wrong" #1). This script
runs the full Spark-vs-DuckDB hash diff for all four auto entries at
corpora that exercise every branch of the gate, including the boundary
itself:

* n =  8,000  (/tmp/scale/sf0.4, factor 4)  — small branch, both sides
* n = 20,000  (/tmp/scale/sf1,  factor 10)  — EXACTLY the threshold:
  Spark's `n < PQ_WIDTH_THRESHOLD` is False and the oracle's
  `>= PQ_WIDTH_THRESHOLD` arm binds, so both engines must flip to the
  large branch at the same row
* n = 40,000  (/tmp/scale/sf2,  factor 20)  — strictly above

Usage: python tools/certify_auto_large.py [--queries a,b] [sf_dir ...]
Defaults to the three dirs above (regenerate with tools/gen_sf.py).
Prints one line per (dir, query) with the branch served, the Spark and
DuckDB walls, and the compare() verdict; exits non-zero on any
mismatch. The DuckDB side re-derives the PQ codebooks in SQL, so a
single large-branch diff runs for many minutes — the --queries subset
flag exists to shard the certification across processes.

The same certification is repeatable via the opt-in test
tests/test_auto_serving.py::test_large_branch_certification
(WIKID_SPARK_SCALE_CERT=1).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

AUTO_QUERIES = (
    "sim_pq_auto_rerank_topk",
    "sim_ann_auto_topk",
    "sim_ann_auto_high_topk",
    "sim_ann_auto_balanced_topk",
)


def certify(spark, sf_dir: str, names=AUTO_QUERIES):
    from wikid_spark.catalog import corpus_rows
    from wikid_spark.oracle import compare
    from wikid_spark.queries.similarity import PQ_WIDTH_THRESHOLD
    from wikid_spark.registry import all_queries

    specs = all_queries()
    n = corpus_rows(sf_dir, "embeddings")
    branch = "large" if n >= PQ_WIDTH_THRESHOLD else "small"
    out = []
    for name in names:
        spec = specs[name]
        # Materialize the Spark side first so the two engine walls
        # separate cleanly in the report (compare() re-collects; the
        # localCheckpoint-backed plans make the second pass cheap).
        t0 = time.monotonic()
        df = spec.fn(spark, sf_dir)
        df.collect()
        spark_wall = time.monotonic() - t0
        t0 = time.monotonic()
        ok, diag = compare(df, spec.oracle, sf_dir)
        oracle_wall = time.monotonic() - t0
        out.append((name, branch, ok, spark_wall + oracle_wall, diag))
        print(
            f"{sf_dir} n={n} branch={branch} {name}: "
            f"{'MATCH' if ok else 'MISMATCH'} "
            f"(spark {spark_wall:.1f}s, oracle+diff {oracle_wall:.1f}s)"
            + ("" if ok else f"\n  {diag}"),
            flush=True,
        )
    return out


def main(argv: list[str]) -> int:
    from wikid_spark.session import get_spark

    names = AUTO_QUERIES
    if argv and argv[0] == "--queries":
        names = tuple(argv[1].split(","))
        argv = argv[2:]
    dirs = argv or ["/tmp/scale/sf0.4", "/tmp/scale/sf1", "/tmp/scale/sf2"]
    spark = get_spark(app_name="certify_auto_large")
    failed = 0
    for d in dirs:
        for _name, _branch, ok, _wall, _diag in certify(spark, d, names):
            failed += 0 if ok else 1
    print(f"{'OK' if failed == 0 else 'FAILED'}: {failed} mismatches")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
