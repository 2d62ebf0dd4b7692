"""The ETL throughput harness (tools/gen_dumps.py + bench.py --etl)
must stay runnable and truthful: exact manifest line counts, dump
shapes the real parsers accept, and stages that produce non-empty
outputs end-to-end at toy scale."""

from __future__ import annotations

import json
import os

from tools.gen_dumps import generate


def test_manifest_line_counts_exact(tmp_path):
    m = generate(str(tmp_path), n_entities=300, n_pages=120, shards=4)

    def count_lines(d):
        total = 0
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f)) as fh:
                total += sum(1 for _ in fh)
        return total

    assert m["wikidata_lines"] == count_lines(m["wikidata_path"])
    assert m["wikipedia_lines"] == count_lines(m["wikipedia_path"])
    # deterministic: regenerate elsewhere, byte-identical shards
    m2 = generate(str(tmp_path / "again"), n_entities=300, n_pages=120, shards=4)
    for f in os.listdir(m["wikidata_path"]):
        a = open(os.path.join(m["wikidata_path"], f), "rb").read()
        b = open(os.path.join(m2["wikidata_path"], f), "rb").read()
        assert a == b


def test_wikidata_dump_parses_with_wrapper_rules(spark, tmp_path):
    """Every line except the '['/']' wrapper must survive the comma
    strip and parse under WIKIDATA_SCHEMA (PERMISSIVE nulls allowed
    but ids must be present on every entity line)."""
    from wikid_spark.plans.wiki import parse_wikidata
    from wikid_spark.sources.wikidata import read_wikidata_dump

    m = generate(str(tmp_path), n_entities=400, n_pages=50, shards=4)
    raw = read_wikidata_dump(spark, m["wikidata_path"])
    n = raw.count()
    assert n == 400
    assert raw.filter("id IS NULL").count() == 0

    tables = parse_wikidata(raw)
    ents = tables["entities"].collect()
    # item-type, non-meta, sitelinked only: strictly between 0 and all
    assert 0 < len(ents) < 400
    # the P31/P279 projection drops the junk claim properties
    for r in tables["entities"].limit(5).collect():
        assert set(r["claims"].keys()) <= {"P31", "P279"}
    assert tables["edges"].filter("dst IS NULL").count() == 0
    assert tables["aliases"].groupBy().sum("count").collect()[0][0] > 0


def test_wikipedia_dump_parses_and_links_join(spark, tmp_path):
    from wikid_spark.plans.wiki import (
        parse_wikidata,
        wikipedia_articles,
        wikipedia_link_counts,
    )
    from wikid_spark.sources.wikidata import read_wikidata_dump
    from wikid_spark.sources.wikipedia import read_wikipedia_pages

    m = generate(str(tmp_path), n_entities=400, n_pages=200, shards=4)
    pages = read_wikipedia_pages(spark, m["wikipedia_path"])
    rows = pages.collect()
    assert len(rows) == 200
    # revision-scope rule: article ids are the PAGE-level ids
    assert all(r["article_id"].startswith("1") for r in rows)

    ets = parse_wikidata(
        read_wikidata_dump(spark, m["wikidata_path"])
    )["entity_texts"]
    counts = wikipedia_link_counts(pages, ets)
    got = counts.collect()
    assert len(got) > 0 and all(r["count"] >= 1 for r in got)

    arts = wikipedia_articles(pages, ets, skip_terms=["disambiguation"])
    a = arts.collect()
    assert 0 < len(a) <= 200
    # redirects / meta-namespace / skip-term pages never survive
    assert all(not r["content"].startswith("#REDIRECT") for r in a)
    assert all("disambiguation" not in r["content"].lower() for r in a)


def test_bench_etl_wiring(spark, tmp_path, monkeypatch):
    """bench.run_etl end-to-end at toy scale: one JSON-able dict with
    the lines/s fields and positive stage times."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_ETL_DIR", str(tmp_path / "dumps"))
    monkeypatch.setenv("SPARK_GRAFT_ETL_ENTITIES", "400")
    monkeypatch.setenv("SPARK_GRAFT_ETL_PAGES", "150")
    out = bench.run_etl(spark)
    json.dumps(out)  # serializable
    assert out["metric"] == "etl_lines_per_sec"
    assert out["wikidata_lines_per_s"] > 0
    assert out["wikipedia_lines_per_s"] > 0
    assert set(out["stages_s"]) == {
        "wikidata_parse_s",
        "wikipedia_priors_s",
        "wikipedia_articles_s",
    }
    assert out["rows"]["entities"] > 0
    assert out["rows"]["alias_counts"] > 0


def test_wikidata_dump_reads_bz2_transparently(spark, tmp_path):
    """The real dump ships as .json.bz2; spark.read.text decompresses
    by codec extension, so the same reader handles both layouts. A
    single .bz2 file is one partition (non-splittable codec) — the
    re-chunked landing zone of gen_dumps is the scale path; this pins
    the compatibility path."""
    import bz2
    import shutil

    m = generate(str(tmp_path / "plain"), n_entities=120, n_pages=10, shards=2)
    bz_dir = tmp_path / "bz"
    bz_dir.mkdir()
    for f in sorted(os.listdir(m["wikidata_path"])):
        with open(os.path.join(m["wikidata_path"], f), "rb") as src, bz2.open(
            bz_dir / (f + ".bz2"), "wb"
        ) as dst:
            shutil.copyfileobj(src, dst)

    from wikid_spark.sources.wikidata import read_wikidata_dump

    plain = read_wikidata_dump(spark, m["wikidata_path"])
    bz = read_wikidata_dump(spark, str(bz_dir))
    a = sorted(r["id"] for r in plain.select("id").collect())
    b = sorted(r["id"] for r in bz.select("id").collect())
    assert a == b and len(a) == 120


def test_alias_priors_end_to_end_over_synthetic_dumps(spark, tmp_path):
    """The full prior pipeline over gen_dumps data: stage-1 alias
    seeds + stage-2 link counts -> additive merge -> priors. Per
    alias, priors sum to 1 (the reference's prior_prob contract); all
    probabilities in (0, 1]."""
    import pyspark.sql.functions as F

    from wikid_spark.plans.wiki import (
        alias_priors,
        merge_alias_counts,
        parse_wikidata,
        wikipedia_link_counts,
    )
    from wikid_spark.sources.wikidata import read_wikidata_dump
    from wikid_spark.sources.wikipedia import read_wikipedia_pages

    m = generate(str(tmp_path), n_entities=500, n_pages=300, shards=4)
    tables = parse_wikidata(read_wikidata_dump(spark, m["wikidata_path"]))
    pages = read_wikipedia_pages(spark, m["wikipedia_path"])
    counts = wikipedia_link_counts(pages, tables["entity_texts"])
    merged = merge_alias_counts(tables["aliases"], counts)
    priors = alias_priors(merged)
    rows = priors.collect()
    assert len(rows) > 0
    sums = (
        priors.groupBy("alias")
        .agg(F.round(F.sum("prob"), 6).alias("s"))
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in sums)
    assert all(0.0 < r["prob"] <= 1.0 for r in rows)


def test_bench_headline_names_are_registered():
    """A typo in bench.HEADLINE would crash the driver's per-round
    BENCH run — pin every name to the registry."""
    import bench
    from wikid_spark.registry import all_queries

    specs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert missing == []
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dupes


def test_bench_emit_line_fits_driver_tail_window(tmp_path, capsys, monkeypatch):
    """The driver keeps only the last ~2000 chars of stdout; the
    emitted JSON line must stay parseable inside that window even for
    a full-size headline payload (and degrade to a pointer line when
    it can't)."""
    import json as _json

    import bench

    monkeypatch.setattr(
        bench, "os", bench.os
    )  # no-op; keep module intact
    # full-size payload: 40 long query names
    payload = {
        "metric": "headline_queries_wall_seconds",
        "value": 1.0,
        "unit": "sec",
        "exec_total": 1.0,
        "build_total": 2.0,
        "queries": {f"qqqqqqqqqqqqqqqqqqqqq_{i:03d}": 1.234 for i in range(40)},
        "repeat": 3,
        "excluded": [],
        "sf": 0.1,
    }
    # point the detail file into tmp by faking __file__
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    bench._emit(payload, dict(payload))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900
    _json.loads(line)
    # oversize payload degrades, still parseable and small
    big = dict(payload, queries={f"n_{i}": 1.0 for i in range(400)})
    bench._emit(big, dict(big))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900
    assert _json.loads(line)["queries"] == {"_see": "bench_detail.json"}
    assert (tmp_path / "bench_detail.json").exists()


def test_is_meta_title_equals_ns_pattern_regex(spark):
    """Round-12 prior-pass fix: the InSet-based `is_meta_title` must
    decide EXACTLY like `rlike(NS_PATTERN)` — adversarial grid plus a
    dump-shaped sweep. Cases cover: every vocabulary namespace upper/
    lower/mixed, optional leading ':', double ':' (regex allows one),
    two-letter interwiki codes any case, three-letter non-namespaces,
    colon-less titles, empty prefixes, embedded (non-prefix) colons,
    space-bearing namespaces, and non-ASCII case-folding traps (İ, K
    Kelvin sign) where Unicode lower() would diverge from Java's
    ASCII-only (?i)."""
    import pyspark.sql.functions as F

    from wikid_spark.plans.wiki import (
        NS_PATTERN,
        WP_META_NAMESPACES,
        is_meta_title,
    )

    titles = []
    for ns in WP_META_NAMESPACES:
        titles += [f"{ns}:X", f"{ns.upper()}:X", f"{ns.lower()}:x",
                   f":{ns}:X", f"::{ns}:X", f"{ns} :X", f"{ns}"]
    titles += [
        "en:Foo", "EN:Foo", "eN:Foo", ":en:Foo", "xyz:Foo", "e:Foo",
        "enn:Foo", "Talk", "Talk:", ":", "::", "", "A:B", "ab:",
        "Template talk:Foo", "Template_talk:Foo", "template TALK:x",
        "No Namespace Here", "Deep:er:colons", " en:space-first",
        "İx:Foo", "Kx:Foo", "ß:Foo", "ssx:Foo", "x:", ":x:",
        "Category:with:inner:colons", "wiki How:x", "wikiHow:x",
    ]
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    got = df.select(
        "title",
        is_meta_title("title").alias("new"),
        F.col("title").rlike(NS_PATTERN).alias("old"),
    ).collect()
    diffs = [(r.title, r.old, r.new) for r in got if r.old != r.new]
    assert diffs == []
