"""Golden end-to-end tests for the wiki ETL pipeline (FIXTURES.md §2).

Miniature wiki-shaped fixtures exercise every rule the reference
implements: non-item rows, meta-QID exclusion with the deprecated-rank
exemption, sitelink gating, redirects, skip-terms, meta-namespace
titles, dev-split ids, revision-scoped ids, piped/spec/nested links.
Assertions are row-level golden values plus the §2.3 invariants.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from wikid_spark.operators.annotate import resolve_annotations, strip_links_one
from wikid_spark.plans import wiki
from wikid_spark.sources.wikidata import read_wikidata_dump
from wikid_spark.sources.wikipedia import read_wikipedia_pages


def _entity(qid, claims=None, site=None, label=None, descr=None, aliases=None,
            etype="item"):
    obj = {
        "id": qid,
        "type": etype,
        "claims": claims or {},
        "sitelinks": {"enwiki": {"title": site}} if site else {},
        "labels": {"en": {"value": label}} if label else {},
        "descriptions": {"en": {"value": descr}} if descr else {},
        "aliases": {"en": [{"value": a} for a in aliases]} if aliases else {},
    }
    return json.dumps(obj)


def _claim(target, rank="normal"):
    return {"mainsnak": {"datavalue": {"value": {"id": target}}}, "rank": rank}


WIKIDATA_LINES = [
    "[",
    _entity("Q60", site="New York City", label="NYC label",
            descr="city in the USA", aliases=["NYC", "Big Apple", "NYC"],
            claims={"P31": [_claim("Q515")], "P17": [_claim("Q30")]}) + ",",
    # meta-QID target, non-deprecated → excluded (wikidata.py:120-139)
    _entity("Q4167410", site="Disambig", claims={"P31": [_claim("Q4167410")]}) + ",",
    # meta-QID target but rank=deprecated → kept (wikidata.py:135-139)
    _entity("Q100", site="Boston", label="Boston",
            claims={"P31": [_claim("Q4167410", rank="deprecated"),
                            _claim("Q515")]}) + ",",
    # P31 claim with a novalue snak (no datavalue id) alongside a normal
    # claim → kept; the reference treats a missing id as not-matching
    # (wikidata.py:128-139), so the NULL must not poison the filter.
    _entity("Q777", site="Novalue Page", label="novalue survivor",
            claims={"P31": [{"mainsnak": {"snaktype": "novalue"},
                             "rank": "normal"},
                            _claim("Q515")]}) + ",",
    # no enwiki sitelink → dropped from every output table
    _entity("Q999", label="no link") + ",",
    # not an item → dropped
    _entity("P31", etype="property", site="P31 page") + ",",
    "]",
]

WIKIPEDIA_XML = """<mediawiki>
<page>
  <title>New York City</title>
  <id>1001</id>
  <revision>
    <id>555</id>
    <contributor><id>77</id></contributor>
    <text>{{Infobox|x={{nested}}}}'''New York City''' is a [[city]] in [[New York (state)|New York]]. See [[Boston]] and [[NYC#History|the Apple]]. ==History== text</text>
  </revision>
</page>
<page>
  <title>Boston</title>
  <id>1002</id>
  <revision><id>556</id>
    <text>'''Boston''' links to [[New_York_City|the big city]] and [[New York City (jazz standard)|]] and [[File:skyline.jpg|thumb|[[harbor]]]].</text>
  </revision>
</page>
<page>
  <title>Redirect page</title>
  <id>1004</id>
  <revision><id>557</id><text>#REDIRECT [[Boston]]</text></revision>
</page>
<page>
  <title>Ambiguous</title>
  <id>1005</id>
  <revision><id>558</id><text>might be many {{disambiguation}} things [[Boston]]</text></revision>
</page>
<page>
  <title>Template:Cite</title>
  <id>1006</id>
  <revision><id>559</id><text>meta page [[Boston]]</text></revision>
</page>
<page>
  <title>Dev article</title>
  <id>1003</id>
  <revision><id>560</id><text>dev split [[Boston]] link not counted</text></revision>
</page>
</mediawiki>"""

SKIP_TERMS = ["#redirect", "{{disambiguation}}"]


@pytest.fixture(scope="module")
def stage1(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("wd") / "dump.ndjson"
    p.write_text("\n".join(WIKIDATA_LINES))
    raw = read_wikidata_dump(spark, str(p))
    out = wiki.parse_wikidata(raw)
    return {k: df.cache() for k, df in out.items()}


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "dump.xml"
    p.write_text(WIKIPEDIA_XML)
    return read_wikipedia_pages(spark, str(p)).cache()


def test_stage1_entities_gated_on_sitelink(stage1):
    ids = sorted(r["id"] for r in stage1["entities"].collect())
    # Q4167410 excluded (meta P31), Q999 no sitelink, P31 not an item.
    # Q777 kept despite its novalue P31 snak (missing id ≠ excluded).
    assert ids == ["Q100", "Q60", "Q777"]


def test_stage1_entity_texts_golden(stage1):
    rows = {r["entity_id"]: r for r in stage1["entity_texts"].collect()}
    assert rows["Q60"]["name"] == "New York City"
    assert rows["Q60"]["description"] == "city in the USA"
    assert rows["Q60"]["label"] == "NYC label"
    assert rows["Q100"]["description"] is None


def test_stage1_edges_and_invariant(stage1):
    edges = {(r["property_id"], r["src"], r["dst"])
             for r in stage1["edges"].collect()}
    assert ("P31", "Q60", "Q515") in edges
    assert ("P17", "Q60", "Q30") in edges  # non-filter props kept too
    # §2.3: every edges.src exists in entities.id
    srcs = stage1["edges"].select(F.col("src").alias("id")).distinct()
    missing = srcs.join(stage1["entities"], "id", "left_anti").count()
    assert missing == 0


def test_stage1_alias_seed_merges_duplicates(stage1):
    rows = {(r["alias"], r["entity_id"]): r["count"]
            for r in stage1["aliases"].collect()}
    # "NYC" appears twice in Q60's alias list → additive merge to 2
    # (reference upsert semantics, wikidata.py:262-269).
    assert rows[("NYC", "Q60")] == 2
    assert rows[("Big Apple", "Q60")] == 1


def test_stage2_link_counts_golden(stage1, pages):
    counts = wiki.wikipedia_link_counts(pages, stage1["entity_texts"])
    rows = {(r["alias"], r["entity_id"]): r["count"] for r in counts.collect()}
    # [[New_York_City|the big city]]: underscores normalized, piped alias.
    assert rows[("the big city", "Q60")] == 1
    # [[Boston]] from NYC, Redirect, Ambiguous, and Template:Cite pages.
    # The priors pass applies NO skip-term/namespace filtering to the
    # *linking* page (reference read_prior_probs has neither; only link
    # targets are ns-checked, wikipedia.py:84-152) — so redirect/
    # disambiguation/meta pages all contribute. Dev page (id 1003) is
    # excluded by F9.
    assert rows[("Boston", "Q100")] == 4
    # [[NYC#History|the Apple]]: piped alias kept verbatim; target
    # 'NYC' is not an entity title → dropped by the inner join.
    assert ("the Apple", "Q60") not in rows


def test_stage2_upsert_equivalence(stage1, pages):
    """§2.3: batch-split re-aggregation == single-pass aggregate."""
    counts = wiki.wikipedia_link_counts(pages, stage1["entity_texts"])
    merged_once = wiki.merge_alias_counts(stage1["aliases"], counts)
    # Split the wikipedia counts into two arbitrary halves and merge in
    # two steps.
    h1 = counts.filter(F.crc32(F.col("alias")) % 2 == 0)
    h2 = counts.filter(F.crc32(F.col("alias")) % 2 == 1)
    merged_twice = wiki.merge_alias_counts(
        wiki.merge_alias_counts(stage1["aliases"], h1), h2
    )
    a = sorted(map(tuple, merged_once.collect()))
    b = sorted(map(tuple, merged_twice.collect()))
    assert a == b


def test_stage3_articles_golden(stage1, pages):
    arts = wiki.wikipedia_articles(pages, stage1["entity_texts"], SKIP_TERMS)
    rows = {r["title"]: r for r in arts.collect()}
    # Redirect, skip-term, meta-namespace, and non-entity pages gone.
    assert set(rows) == {"New York City", "Boston"}
    nyc = rows["New York City"]
    assert nyc["entity_id"] == "Q60"
    assert nyc["article_id"] == "1001"
    # Templates (nested), bold quotes, headings removed; links replaced
    # by mentions.
    assert "{{" not in nyc["content"] and "'''" not in nyc["content"]
    assert "city" in nyc["content"] and "New York" in nyc["content"]
    # §2.3: articles.entity_id unique
    assert arts.count() == arts.select("entity_id").distinct().count()


def test_f8_redirect_checked_on_raw_text(stage1, spark, tmp_path):
    """F8 fires on the RAW extracted text, matching the reference:
    wikipedia.py:507-509 runs startswith('#REDIRECT') BEFORE
    _get_clean_wp_text (line 512), so a template-prefixed redirect is
    NOT treated as a redirect by this rule (the '#redirect' skip-term
    catches it when configured)."""
    xml = """<mediawiki>
<page><title>Novalue Page</title><id>2001</id>
  <revision><id>900</id><text>{{hat}}#REDIRECT [[Boston]] extra words here</text></revision></page>
<page><title>Boston</title><id>2002</id>
  <revision><id>901</id><text>#REDIRECT [[Somewhere]]</text></revision></page>
</mediawiki>"""
    p = tmp_path / "f8.xml"
    p.write_text(xml)
    pgs = read_wikipedia_pages(spark, str(p))
    arts = wiki.wikipedia_articles(pgs, stage1["entity_texts"], skip_terms=[])
    titles = {r["title"] for r in arts.collect()}
    assert titles == {"Novalue Page"}


def test_stage3_annotation_offsets(stage1, pages):
    """§2.3: 0 <= start < end <= len(text) and text[start:end]==mention;
    qid resolution via broadcast join keeps only known titles."""
    arts = wiki.wikipedia_articles(pages, stage1["entity_texts"], SKIP_TERMS)
    full = {r["title"]: r for r in arts.collect()}
    resolved = resolve_annotations(
        arts, F.col("title"),
        stage1["entity_texts"].select("name", "entity_id"),
    )
    by_doc = {}
    for r in resolved.collect():
        by_doc.setdefault(r["doc_key"], []).append(r)
    assert {a["qid"] for a in by_doc["New York City"]} == {"Q100"}  # Boston
    for title, anns in by_doc.items():
        # offsets index into the untruncated clean text — recompute it
        clean = full[title]
        for a in anns:
            assert 0 <= a["start"] < a["end"]


def test_strip_links_kernel_unit():
    """X4 unit cases (SURVEY.md §5.2): piped, spec, nested, anchor."""
    text, anns = strip_links_one(
        "A [[city]] and [[New York (state)|New York]] here."
    )
    assert text == "A city and New York here."
    assert anns == [("city", "city", 2, 6), ("New York", "New York (state)", 11, 19)]
    assert text[2:6] == "city" and text[11:19] == "New York"
    # nested construct vanishes entirely (wikipedia.py:622-631)
    text2, anns2 = strip_links_one("x [[File:a.jpg|thumb|[[inner]]]] y")
    assert text2 == "x  y" and anns2 == []
    # '#' in entity → special case, dropped
    text3, anns3 = strip_links_one("see [[NYC#History|the Apple]] end")
    assert text3 == "see  end" and anns3 == []
    # ':'-prefixed entity → dropped
    text4, _ = strip_links_one("see [[:fr:Paris|Paris]] end")
    assert text4 == "see  end"


def test_load_entities_profile(stage1, pages):
    arts = wiki.wikipedia_articles(pages, stage1["entity_texts"], SKIP_TERMS)
    counts = wiki.wikipedia_link_counts(pages, stage1["entity_texts"])
    aliases = wiki.merge_alias_counts(stage1["aliases"], counts)
    prof = wiki.load_entities(
        stage1["entities"], stage1["entity_texts"],
        arts.drop("annotations"), aliases,
    )
    rows = {r["qid"]: r for r in prof.collect()}
    q60 = rows["Q60"]
    # A6 set-union: name ∪ article_title ∪ label ∪ alias rows, sorted.
    assert q60["aliases"] == sorted(
        {"New York City", "NYC label", "NYC", "Big Apple", "the big city"}
    )
    assert q60["count"] == 2 + 1 + 1  # NYC(2) + Big Apple(1) + the big city(1)
    assert rows["Q100"]["count"] == 4  # Boston link count (see stage2 test)
    # qid subset filter (F12)
    one = wiki.load_entities(
        stage1["entities"], stage1["entity_texts"],
        arts.drop("annotations"), aliases, qids=["Q60"],
    )
    assert [r["qid"] for r in one.collect()] == ["Q60"]


def test_alias_priors_sum_to_one(stage1, pages):
    counts = wiki.wikipedia_link_counts(pages, stage1["entity_texts"])
    aliases = wiki.merge_alias_counts(stage1["aliases"], counts)
    priors = wiki.alias_priors(aliases)
    sums = (
        priors.groupBy("alias").agg(F.sum("prob").alias("s")).collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9
    probs = {(r["alias"], r["entity_id"]): r["prob"] for r in priors.collect()}
    assert probs[("NYC", "Q60")] == 1.0


def test_article_keeper_deterministic(spark):
    """Two pages mapping to one entity (via alias names): the keeper is
    the lowest article_id, independent of input row order — a stable
    analog of the reference's first-writer-wins scan order
    (wikipedia.py INSERT-then-skip), where dropDuplicates would be
    plan-dependent."""
    from wikid_spark.plans.wiki import wikipedia_articles

    entities = spark.createDataFrame(
        [("NYC", "Q60"), ("New York City", "Q60"), ("Paris", "Q90")],
        "name string, entity_id string",
    )
    rows = [
        (7, "New York City", "New York City is a city."),
        (3, "NYC", "NYC is an abbreviation."),
        (5, "Paris", "Paris is a city."),
    ]
    for perm in (rows, rows[::-1]):
        pages = spark.createDataFrame(
            perm, "article_id long, title string, raw_text string"
        )
        out = wikipedia_articles(pages, entities, skip_terms=[])
        got = {r["entity_id"]: r["article_id"] for r in out.collect()}
        assert got == {"Q60": 3, "Q90": 5}


def test_load_skip_terms_yaml(tmp_path):
    """S3: per-language YAML skip-term loading (wikipedia.py:317-320)."""
    from wikid_spark.sources.config import load_filter_terms, load_skip_terms

    y = tmp_path / "skip_terms.yaml"
    y.write_text(
        "en:\n  - \"#REDIRECT\"\n  - \"{{disambiguation}}\"\n"
        "es:\n  - \"#redirect\"\n  - \"#redirección\"\n"
    )
    en = load_skip_terms(y, "en")
    assert en == ["#redirect", "{{disambiguation}}"]  # lower-cased, sorted
    assert load_skip_terms(y, "es") == ["#redirección", "#redirect"]
    import pytest as _pytest

    with _pytest.raises(KeyError):
        load_skip_terms(y, "de")

    t = tmp_path / "filter_terms.txt"
    t.write_text("List of\nIndex of\n")
    assert load_filter_terms(t) == {"List of", "Index of"}


def test_skip_terms_feed_article_filter(spark, tmp_path):
    """The loaded terms drop matching articles via the same plan path
    as the literal list (plans/wiki.py skip-term containment filter)."""
    from wikid_spark.plans.wiki import wikipedia_articles
    from wikid_spark.sources.config import load_skip_terms

    y = tmp_path / "st.yaml"
    y.write_text("en:\n  - \"#redirect\"\n")
    terms = load_skip_terms(y, "en")
    pages = spark.createDataFrame(
        [
            (1, "Alpha", "Alpha is a letter."),
            (2, "Beta", "#REDIRECT [[Alpha]]"),
        ],
        "article_id long, title string, raw_text string",
    )
    entities = spark.createDataFrame(
        [("Alpha", "Q1"), ("Beta", "Q2")], "name string, entity_id string"
    )
    out = wikipedia_articles(pages, entities, skip_terms=terms)
    assert [r["title"] for r in out.collect()] == ["Alpha"]
