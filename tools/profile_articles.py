"""Per-substage profile of the Wikipedia ARTICLE pass (round-13 task:
the last ETL stage without a breakdown at bench scale).

Same discipline as tools/profile_wikipedia.py (which found the
round-12 prior-pass 2.4x) and the round-11 wikidata barrier: time each
cumulative slice of wikipedia_articles against a noop sink so the fix
targets the measured hot spot.

Cumulative slices:
  scan      — XML record assembly + projection only
  filters   — + meta-title / skip-term / redirect gates (F6-F8)
  clean     — + clean_wikitext regex chain (X3 unrolled part)
  deep      — + clean_deep_templates barrier + fixpoint UDF (X3 tail)
  annotate  — + X4 link-removal/mention-offset pandas UDF
  full      — + broadcast title join + truncate + keeper window

Usage: python tools/profile_articles.py [n_pages]
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
    from wikid_spark.plans.wiki import wikipedia_articles
    from wikid_spark.session import get_spark
    from wikid_spark.sources.wikipedia import read_wikipedia_pages

    spark = get_spark(app_name="profile_articles")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = generate("/tmp/etl_dumps", 400_000, n_pages)
    path = manifest["wikipedia_path"]
    lines = manifest["wikipedia_lines"]
    cores = spark.sparkContext.defaultParallelism

    import pyspark.sql.functions as F

    from wikid_spark.functions.text import clean_wikitext
    from wikid_spark.operators.annotate import annotate
    from wikid_spark.operators.cleanup import clean_deep_templates
    from wikid_spark.plans.wiki import is_meta_title

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
    skip = ["disambiguation"]

    def viable(p):
        terms = F.array(*[F.lit(t.lower()) for t in skip])
        return (
            p.filter(~is_meta_title("title"))
            .filter(
                ~F.exists(
                    terms, lambda t: F.contains(F.lower("raw_text"), t)
                )
            )
            .filter(
                ~F.coalesce(
                    F.col("raw_text").startswith("#REDIRECT"), F.lit(True)
                )
            )
        )

    def cleaned(p):
        return clean_deep_templates(
            viable(p)
            .withColumn("ctext", clean_wikitext("raw_text"))
            .drop("raw_text"),
            "ctext",
        )

    def run(tag, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        w = time.perf_counter() - t0
        print(
            f"{tag:9s} {w:7.2f} s  {lines / w:10.0f} lines/s "
            f"{lines / w / cores:8.0f} /core",
            flush=True,
        )
        return w

    # warmup (JVM + page cache)
    pages.select("title").write.mode("overwrite").format("noop").save()

    for rep in range(2):
        print(
            f"-- pass {rep + 1} ({n_pages} pages, {lines} lines, "
            f"{cores} cores)"
        )
        run("scan", read_wikipedia_pages(spark, path))
        run("filters", viable(read_wikipedia_pages(spark, path)))
        run(
            "clean",
            viable(read_wikipedia_pages(spark, path))
            .withColumn("ctext", clean_wikitext("raw_text"))
            .drop("raw_text"),
        )
        run("deep", cleaned(read_wikipedia_pages(spark, path)))
        run("annotate", annotate(cleaned(read_wikipedia_pages(spark, path)), "ctext"))
        run(
            "full",
            wikipedia_articles(
                read_wikipedia_pages(spark, path),
                entity_texts,
                skip_terms=skip,
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
