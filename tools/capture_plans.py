"""Capture .explain("formatted") for registered queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [name ...]
  tag     — subdirectory under plans/ (e.g. r16)
  suffix  — appended to the file stem (e.g. before / after)
  names   — query names; default = the bench HEADLINE list.

Writes plans/<tag>/<query>_<suffix>.txt. Building a DataFrame runs any
driver-side build work the query does (Lloyd training, BPE rounds), so
this is also a smoke test that every named query still constructs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from wikid_spark.registry import all_queries
from wikid_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        print(f"plan: {name}", file=sys.stderr, flush=True)
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
