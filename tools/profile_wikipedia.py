"""Per-stage profile of the Wikipedia prior pass (round-12 task #6).

Round 11 profiled the Wikidata stage and found a 1.79x fix (parse-once
Generate barrier); this applies the same discipline to the prior pass:
time each sub-stage of bench.py --etl stage 2 independently so the fix
targets the measured hot spot instead of a guess.

Sub-stages (each a noop-sink run over the same dump):
  scan       — XML datasource record assembly + field projection only
  links      — + explode(extract_links) + link-body normalization
  counts     — + groupBy(alias, entity_title) count
  full       — + broadcast title join + additive merge (the benched span)

Usage: python tools/profile_wikipedia.py [n_pages]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    from tools.gen_dumps import generate
    from wikid_spark.plans.wiki import (
        merge_alias_counts,
        wikipedia_link_counts,
    )
    from wikid_spark.session import get_spark
    from wikid_spark.sources.wikipedia import read_wikipedia_pages

    spark = get_spark(app_name="profile_wikipedia")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = generate("/tmp/etl_dumps", 400_000, n_pages)
    path = manifest["wikipedia_path"]
    lines = manifest["wikipedia_lines"]
    cores = spark.sparkContext.defaultParallelism

    import pyspark.sql.functions as F

    from wikid_spark.functions.text import extract_links

    # Alias seeds + entity_texts come from the wikidata stage in the
    # real pipeline; here a cheap stand-in built from the dump titles
    # keeps the join/merge shapes identical without re-running stage 1.
    pages = read_wikipedia_pages(spark, path)
    entity_texts = (
        pages.select(
            F.col("title").alias("name"),
            F.concat(F.lit("Q"), F.col("article_id")).alias("entity_id"),
        )
        .limit(200_000)
        .cache()
    )
    entity_texts.count()
    seeds = entity_texts.select(
        F.col("name").alias("alias"),
        "entity_id",
        F.lit(1).cast("long").alias("count"),
    )

    def run(tag, df):
        # each run re-reads the dump (page cache warm after pass 1)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        w = time.perf_counter() - t0
        print(
            f"{tag:8s} {w:7.2f} s  {lines / w:10.0f} lines/s "
            f"{lines / w / cores:8.0f} /core",
            flush=True,
        )
        return w

    # warmup (JVM + page cache)
    pages.select("title").write.mode("overwrite").format("noop").save()

    for rep in range(2):
        print(f"-- pass {rep + 1} ({n_pages} pages, {lines} lines, {cores} cores)")
        run("scan", read_wikipedia_pages(spark, path))
        p = read_wikipedia_pages(spark, path)
        run(
            "links",
            p.select(F.explode(extract_links("raw_text")).alias("b")),
        )
        p = read_wikipedia_pages(spark, path)
        run("counts", wikipedia_link_counts(p, entity_texts))
        p = read_wikipedia_pages(spark, path)
        run(
            "full",
            merge_alias_counts(seeds, wikipedia_link_counts(p, entity_texts)),
        )
    spark.stop()


if __name__ == "__main__":
    main()
