"""Round-15 within-run dispersion study for VERDICT r14 #5.

Two open watches, neither with a code change to A/B — so the honest
test is dispersion: run each watched workload repeatedly inside ONE
process (same JVM, same page cache, same host) and ask whether the
cross-round deltas that triggered the watch fit inside the within-run
spread.

(a) BENCH_ETL_r14 wikidata stage ratio_host_normalized 0.811 vs r13.
(b) BENCH_r14 raw movers: sim_ann_auto_topk 1.22x, graph_pagerank
    1.17x, q31_weighted_median 1.14x, sim_lsh_multitable_topk 1.11x.

Usage: python tools/ab_watch_r15.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from bench import calibrate
from wikid_spark.registry import all_queries
from wikid_spark.session import get_spark

WATCH = [
    "sim_ann_auto_topk",
    "graph_pagerank",
    "q31_weighted_median",
    "sim_lsh_multitable_topk",
]
REPS = 6
ETL_REPS = 4


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_watch_r15")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # bench.py's uniform warmup
    from wikid_spark.catalog import TABLES
    from wikid_spark.catalog import table as _t

    for t in TABLES:
        _t(spark, sf_dir, t).write.mode("overwrite").format("noop").save()
    spark.range(32).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf, "id long"
    ).write.mode("overwrite").format("noop").save()

    out: dict = {"sf_dir": sf_dir, "reps": REPS}
    # Interleaved rounds (not back-to-back per query) so a slow host
    # phase hits every query equally instead of one.
    runs: dict[str, list[float]] = {n: [] for n in WATCH}
    frames = {}
    for n in WATCH:
        frames[n] = specs[n].fn(spark, sf_dir)
        frames[n].write.mode("overwrite").format("noop").save()  # warm
    for _ in range(REPS):
        for n in WATCH:
            t0 = time.perf_counter()
            frames[n].write.mode("overwrite").format("noop").save()
            runs[n].append(time.perf_counter() - t0)
    out["queries"] = {
        n: {
            "median_s": round(statistics.median(v), 3),
            "min_s": round(min(v), 3),
            "max_s": round(max(v), 3),
            "spread_max_over_min": round(max(v) / min(v), 3),
            "runs": [round(x, 3) for x in v],
        }
        for n, v in runs.items()
    }

    # (a) wikidata ETL stage, ETL_REPS repeats of scan->parse->write
    from tools.gen_dumps import generate
    from wikid_spark.plans.wiki import parse_wikidata_core
    from wikid_spark.sources.wikidata import read_wikidata_dump

    dump_dir = os.environ.get("SPARK_GRAFT_ETL_DIR", "/tmp/etl_dumps")
    n_ent = int(os.environ.get("SPARK_GRAFT_ETL_ENTITIES", "400000"))
    n_pages = int(os.environ.get("SPARK_GRAFT_ETL_PAGES", "150000"))
    manifest = generate(dump_dir, n_ent, n_pages)
    walls = []
    for _ in range(ETL_REPS):
        out_dir = tempfile.mkdtemp(prefix="ab_etl_")
        t0 = time.perf_counter()
        raw = read_wikidata_dump(spark, manifest["wikidata_path"])
        parse_wikidata_core(raw).write.mode("overwrite").parquet(
            f"{out_dir}/core"
        )
        walls.append(time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    out["wikidata_stage"] = {
        "lines": manifest["wikidata_lines"],
        "walls_s": [round(x, 2) for x in walls],
        "median_s": round(statistics.median(walls), 2),
        "spread_max_over_min": round(max(walls) / min(walls), 3),
        "median_lines_per_s": round(
            manifest["wikidata_lines"] / statistics.median(walls)
        ),
    }
    out["calib"] = calibrate(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
