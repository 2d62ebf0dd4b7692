"""The wiki ETL pipeline — the reference's own surface, Spark-first.

Three stage jobs (SURVEY.md §3.1) and the two query APIs (§3.2), each a
pure DataFrame → DataFrame program. Stage boundaries are Parquet writes
owned by the caller; nothing here collects to the driver.

Reference parity notes (all citations into /root/reference/scripts/):

* Only entities with a ``{lang}wiki`` sitelink are persisted — the
  reference's ``_write_to_db`` iterates ``title_to_id``
  (wiki/wikidata.py:227-247), so sitelink presence is the effective
  keep-gate for every output table, not just the title map.
* ``claims`` stays TYPED (map of the filtered P31/P279 claim arrays)
  instead of the reference's ``json.dumps`` TEXT (wikidata.py:233);
  export with ``F.to_json`` at a sink boundary if needed.
* Alias counts are aggregation, not upsert: the reference's additive
  ``ON CONFLICT`` merge (wikidata.py:262-269, wikipedia.py:108-115)
  re-expressed as union → groupBy → sum, which is associative and
  therefore batch-partition independent (tested property).
* The prior pass runs page-granular, not raw-line-granular. The
  reference scans XML lines and attributes links to the most recently
  seen article id (wikipedia.py:128-152); with structured pages the
  attribution is exact rather than incidental.

Scale design: the only big shuffles are the alias/link groupBys (keyed
on alias — Zipfian, covered by AQE skew handling) and the profile
aggregation (keyed on entity id — near-uniform). The title→id map is a
~10⁷-row, two-narrow-column dimension at full-wiki scale: broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from wikid_spark.functions.text import (
    capitalize_first,
    clean_wikitext,
    extract_links,
    parse_link,
    strip_anchor,
    truncate_on_word,
)
from wikid_spark.operators.annotate import annotate
from wikid_spark.operators.cleanup import clean_deep_templates
from wikid_spark.sources.wikipedia import is_dev

# Meta-QIDs excluded via P31/P279 (namespaces.py:6-25 + the punctuation
# and letter classes appended at wikidata.py:75-83).
WD_META_ITEMS = [
    "Q163875", "Q191780", "Q224414", "Q4167836", "Q4167410", "Q4663903",
    "Q11266439", "Q13406463", "Q15407973", "Q18616576", "Q19887878",
    "Q22808320", "Q23894233", "Q33120876", "Q42104522", "Q47460393",
    "Q64875536", "Q66480449",
    # punctuation
    "Q1383557", "Q10617810",
    # letters etc
    "Q188725", "Q19776628", "Q3841820", "Q17907810", "Q9788", "Q9398093",
]
NEG_PROP_FILTER = ("P31", "P279")

# Meta-namespace title pattern (wikipedia.py:43-47; vocab
# namespaces.py:38-129). Interwiki prefixes + named namespaces,
# case-insensitive, optionally ':'-prefixed.
WP_META_NAMESPACES = [
    "Bestand", "File", "Kategori", "Category", "Categorie", "b",
    "betawikiversity", "Book", "c", "Commons", "d", "dbdump", "download",
    "Draft", "Education", "Foundation", "Gadget", "Gadget definition",
    "Gebruiker", "gerrit", "Help", "Image", "Incubator", "m", "mail",
    "mailarchive", "media", "MediaWiki", "MediaWiki talk", "Mediawikiwiki",
    "MediaZilla", "Meta", "Metawikipedia", "Module", "mw", "n", "nost",
    "oldwikisource", "outreach", "outreachwiki", "otrs", "OTRSwiki",
    "Portal", "phab", "Phabricator", "Project", "q", "quality", "rev",
    "s", "spcom", "Special", "species", "Strategy", "sulutil", "svn",
    "Talk", "Template", "Template talk", "Testwiki", "ticket", "TimedText",
    "Toollabs", "tools", "tswiki", "User", "User talk", "v", "voy",
    "w", "Wikibooks", "Wikidata", "wikiHow", "Wikinvest", "wikilivres",
    "Wikimedia", "Wikinews", "Wikipedia", "Wikipedia talk", "Wikiquote",
    "Wikisource", "Wikispecies", "Wikitech", "Wikiversity", "Wikivoyage",
    "wikt", "wiktionary", "wmf", "wmania", "x",
]

NS_PATTERN = (
    "(?i)^(:?[a-z][a-z]:|"
    + "|".join(":?" + ns.replace(" ", "\\ ") + ":" for ns in WP_META_NAMESPACES)
    + ")"
)

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_NS_FOLDED = sorted({ns.lower() for ns in WP_META_NAMESPACES})


def is_meta_title(col) -> Column:
    """`NS_PATTERN` as set membership instead of regex alternation.

    `rlike(NS_PATTERN)` walks a ~100-branch case-insensitive
    alternation per row — measured 75% of the whole prior-pass counts
    stage at the bench ETL scale (SCALE.md round-12 profile). The
    pattern only ever inspects the title's prefix up to the first
    ':', so the equivalent decision is: strip one optional leading
    ':', take the text before the first ':' (a colon must exist),
    ASCII-case-fold it, and test (a) membership in the folded
    namespace vocabulary — Catalyst compiles the ~100-literal `isin`
    to an O(1) InSet hash probe — or (b) the two-ASCII-letter
    interwiki-language rule. The fold uses `translate` over exactly
    A-Z→a-z, NOT `lower()`: Java's `(?i)` without UNICODE_CASE folds
    US-ASCII only, and `lower()`'s Unicode mapping (İ→i̇, K→k) would
    accept titles the regex rejects. Behavior-pinned equal to
    `rlike(NS_PATTERN)` by the adversarial grid + dump-wide diff in
    test_etl_bench.py."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.when(
        c.startswith(":"), c.substr(F.lit(2), F.length(c))
    ).otherwise(c)
    pre = F.substring_index(stripped, ":", 1)
    folded = F.translate(pre, _ASCII_UPPER, _ASCII_LOWER)
    two_letter = (F.length(folded) == 2) & folded.rlike("^[a-z][a-z]$")
    return stripped.contains(":") & (folded.isin(_NS_FOLDED) | two_letter)


# ---------------------------------------------------------------- stage 1


def parse_wikidata(
    raw: DataFrame, lang: str = "en"
) -> dict[str, DataFrame]:
    """Typed wikidata entities → the four stage-1 output tables, as
    one composed plan: ``stage1_outputs(parse_wikidata_core(raw))``.

    NOTE the single-parse discipline: the four outputs share the
    parsed/filtered core, and each output's write re-executes its
    lineage — writing all four straight off this function re-parses
    the dump four times (measured: ~4 × 9 s at the 1.7 GB bench
    scale). Production stage jobs materialize the core ONCE — write
    `parse_wikidata_core` to parquet (the stage boundary this module's
    docstring assigns to the caller), read it back, and derive the
    outputs from the columnar core (`bench.py --etl` does exactly
    this). A 100 TB dump parses once either way; the core is the
    filtered, pruned fraction of it."""
    return stage1_outputs(parse_wikidata_core(raw, lang), lang)


def parse_wikidata_core(raw: DataFrame, lang: str = "en") -> DataFrame:
    """The expensive half of stage 1, run exactly once per dump: F1
    (type filter), F2 (negative P31/P279 filter with the
    deprecated-rank exemption, wikidata.py:120-139), F3/F4 (language
    projection + sitelink gate). Returns the kept-entity core
    ``(id, title, label, description, aliases, claims)`` — the table
    to materialize at the stage boundary."""
    site = f"{lang}wiki"
    meta = F.array(*[F.lit(q) for q in WD_META_ITEMS])

    def bad_claim(c):
        # somevalue/novalue snaks have no datavalue id; under three-valued
        # logic the bare predicate would be NULL and filter(~excluded) would
        # drop the entity, where the reference (wikidata.py:128-139) treats a
        # missing id as not-matching and keeps it. coalesce to False.
        return F.coalesce(
            (c["rank"] != "deprecated")
            & F.array_contains(meta, c["mainsnak"]["datavalue"]["value"]["id"]),
            F.lit(False),
        )

    excluded = F.lit(False)
    for prop in NEG_PROP_FILTER:
        excluded = excluded | F.exists(
            F.coalesce(F.col("claims")[prop], F.array()), bad_claim
        )

    kept = (
        raw.filter(F.col("type") == "item")
        .filter(~excluded)
        .filter(F.col("sitelinks")[site].isNotNull())
        .select(
            F.col("id"),
            F.col("sitelinks")[site]["title"].alias("title"),
            F.col("labels")[lang]["value"].alias("label"),
            F.col("descriptions")[lang]["value"].alias("description"),
            F.transform(
                F.coalesce(F.col("aliases")[lang], F.array()),
                lambda a: a["value"],
            ).alias("aliases"),
            F.col("claims"),
        )
    )
    return kept


def stage1_outputs(
    kept: DataFrame, lang: str = "en"
) -> dict[str, DataFrame]:
    """The four stage-1 tables derived from the parsed core: X8
    (claims→edges explode) and the alias seed rows (count=1 each,
    wikidata.py:242-243) plus the entities/entity_texts projections —
    all cheap columnar derivations when ``kept`` is a materialized
    parquet stage."""
    entities = kept.select(
        "id",
        F.map_filter(
            F.col("claims"), lambda k, _: k.isin(*NEG_PROP_FILTER)
        ).alias("claims"),
    )
    entity_texts = kept.select(
        F.col("id").alias("entity_id"),
        F.col("title").alias("name"),
        "description",
        "label",
    )
    # X8: every claim's target QID → (property_id, src, dst) triples.
    edges = (
        kept.select("id", F.explode("claims").alias("prop", "cs"))
        .select(
            "id",
            "prop",
            F.explode(
                F.transform(F.col("cs"), lambda c: c["mainsnak"]["datavalue"]["value"]["id"])
            ).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .select(
            F.col("prop").alias("property_id"),
            F.col("id").alias("src"),
            F.col("dst"),
        )
        .dropDuplicates()
    )
    alias_seed = (
        kept.select("id", F.explode("aliases").alias("alias"))
        .groupBy("alias", F.col("id").alias("entity_id"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return {
        "entities": entities,
        "entity_texts": entity_texts,
        "edges": edges,
        "aliases": alias_seed,
    }


# ---------------------------------------------------------------- stage 2


def wikipedia_link_counts(
    pages: DataFrame, entity_texts: DataFrame
) -> DataFrame:
    """Alias→entity link counts from article wikitext (A1, X1, F9, J3).

    Replaces the reference's driver-memory nested-dict aggregate
    (wikipedia.py:28, 175-201) with a distributed groupBy — the
    unbounded-memory defect disappears structurally.
    """
    links = (
        pages.filter(~is_dev("article_id"))
        .select(F.explode(extract_links("raw_text")).alias("raw_body"))
        # The reference normalizes '_'→' ' on the WHOLE body (alias
        # included) before splitting (wikipedia.py:213).
        .select(
            F.trim(F.regexp_replace("raw_body", "_", " ")).alias("body")
        )
        .select(parse_link(F.col("body")).alias("lk"))
        # Parse-once barrier (round-12 per-stage profile, same idiom as
        # sources/wikidata.py:88): collapsed projections INLINE the
        # (alias, entity_title) expression trees — parse_link's splits
        # and regexps — into every consumer, so the three filter
        # predicates and the two groupBy keys each re-ran the full link
        # parse (+filter alone added ~4.3 s of the 5.9 s counts stage
        # at the bench ETL scale; the predicate itself is ~0.1 s on
        # materialized rows). Explode-of-1-element-array is a Generate
        # node: consumers above it read the generated struct's fields,
        # so each link body is parsed exactly once.
        .select(
            F.explode(
                F.array(
                    F.struct(
                        # Simple [[link]] normalizes the alias too
                        # (anchor strip); piped links keep the alias
                        # verbatim (wikipedia.py:210-243).
                        F.when(
                            F.col("lk.alias") == F.col("lk.entity"),
                            F.trim(strip_anchor(F.col("lk.alias"))),
                        )
                        .otherwise(F.trim(F.col("lk.alias")))
                        .alias("alias"),
                        capitalize_first(
                            F.trim(strip_anchor(F.col("lk.entity")))
                        ).alias("entity_title"),
                    )
                )
            ).alias("l")
        )
        .select("l.alias", "l.entity_title")
        .filter(
            (F.col("alias") != "")
            & (F.col("entity_title") != "")
            & ~is_meta_title("entity_title")
        )
    )
    counts = links.groupBy("alias", "entity_title").agg(
        F.count(F.lit(1)).alias("count")
    )
    titles = entity_texts.select(
        F.col("name"), F.col("entity_id")
    )
    return (
        counts.join(F.broadcast(titles), counts["entity_title"] == titles["name"])
        .select("alias", "entity_id", "count")
    )


def merge_alias_counts(*sources: DataFrame) -> DataFrame:
    """A2/S6: additive merge of alias-count batches as re-aggregation.
    Associative → any batch partitioning yields identical totals."""
    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s)
    return out.groupBy("alias", "entity_id").agg(F.sum("count").alias("count"))


# ---------------------------------------------------------------- stage 3


def wikipedia_articles(
    pages: DataFrame,
    entity_texts: DataFrame,
    skip_terms: list[str],
    n_char_limit: int = 1000,
) -> DataFrame:
    """Clean article texts for entity-linked pages (F6–F8, X3, X4, L2).

    Output: ``articles(entity_id, article_id, title, content,
    annotations)``. The reference discards the X4 annotations in this
    pass (wikipedia.py:357-360); we keep them — they cost nothing extra
    and are the payload downstream NEL training actually wants.
    """
    terms = F.array(*[F.lit(t.lower()) for t in skip_terms])
    viable = (
        pages.filter(~is_meta_title("title"))
        .filter(
            ~F.exists(terms, lambda t: F.contains(F.lower("raw_text"), t))
        )
        # F8 runs on the RAW extracted text by design: the reference's
        # startswith('#REDIRECT') check (wikipedia.py:507-509) fires on
        # the text straight out of the <text> tag, BEFORE
        # _get_clean_wp_text is called (wikipedia.py:512) — so a page
        # whose #REDIRECT follows a leading template is NOT treated as
        # a redirect there either (it is normally caught by the
        # '#redirect' skip-term instead).
        .filter(~F.coalesce(F.col("raw_text").startswith("#REDIRECT"), F.lit(True)))
    )
    cleaned = clean_deep_templates(
        # raw_text is consumed by the ctext projection and nothing
        # above; drop it BEFORE clean_deep_templates' expression
        # barrier, whose explode(struct(*)) would otherwise ship the
        # full markup column through the Generate (the optimizer does
        # not prune struct fields through this explode — plan-checked).
        viable.withColumn("ctext", clean_wikitext("raw_text")).drop(
            "raw_text"
        ),
        "ctext",
    )
    stripped = annotate(cleaned, "ctext")
    titles = entity_texts.select("name", "entity_id")
    joined = stripped.join(
        F.broadcast(titles), stripped["title"] == titles["name"]
    ).select(
        "entity_id",
        "article_id",
        "title",
        truncate_on_word(F.col("clean_text"), n_char_limit).alias("content"),
        "annotations",
    )
    # Deterministic one-article-per-entity keeper: lowest article_id
    # wins. The reference keeps whichever page its single-threaded scan
    # hit first (wikipedia.py INSERT-then-skip) — arbitrary but stable
    # per run; dropDuplicates would be plan-dependent (nondeterministic
    # across runs/partitionings). Same cost class: one shuffle on
    # entity_id either way.
    keeper = Window.partitionBy("entity_id").orderBy("article_id")
    return (
        joined.withColumn("_rn", F.row_number().over(keeper))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------- query APIs


def load_entities(
    entities: DataFrame,
    entity_texts: DataFrame,
    articles: DataFrame,
    aliases: DataFrame,
    qids: list[str] | None = None,
) -> DataFrame:
    """Entity profiles (§3.2; __init__.py:150-183). J2 + A3 + A6.

    One row per entity: name/description/label, article title+text,
    sorted distinct alias array (name ∪ article_title ∪ label ∪ alias
    rows — the reference's set-union, __init__.py:134-143), total count.
    """
    base = entities.select("id")
    if qids:
        base = base.filter(F.col("id").isin(qids))
    et = entity_texts.withColumnRenamed("entity_id", "id")
    art = articles.select(
        F.col("entity_id").alias("id"),
        F.col("title").alias("article_title"),
        F.col("content").alias("article_text"),
    )
    al = aliases.withColumnRenamed("entity_id", "id")
    agg = (
        base.join(et, "id", "left")
        .join(art, "id", "left")
        .join(al, "id", "left")
        .groupBy("id", "name", "description", "label", "article_title", "article_text")
        .agg(
            F.array_sort(F.collect_set("alias")).alias("alias_rows"),
            F.sum("count").alias("count"),
        )
    )
    alias_union = F.array_sort(
        F.array_distinct(
            F.filter(
                F.concat(
                    F.array("name", "article_title", "label"),
                    F.col("alias_rows"),
                ),
                lambda x: x.isNotNull() & (x != ""),
            )
        )
    )
    return agg.select(
        F.col("id").alias("qid"),
        "name",
        alias_union.alias("aliases"),
        F.coalesce("count", F.lit(0)).alias("count"),
        "description",
        "article_title",
        "article_text",
    )


def alias_priors(aliases: DataFrame) -> DataFrame:
    """A4/A5: per-alias prior probabilities via ratio-to-report window
    (__init__.py:204-223) — no driver-side second pass. Σprob = 1 per
    alias (property-tested)."""
    w = Window.partitionBy("alias")
    return aliases.select(
        "alias",
        "entity_id",
        (
            F.col("count")
            / F.greatest(F.sum("count").over(w), F.lit(1))
        ).alias("prob"),
    )
