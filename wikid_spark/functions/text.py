"""Text kernels from the reference, as JVM-side column expressions.

Each function documents the reference behavior it reproduces
(file:line into /root/reference/). These are pure Column→Column
combinators — they inline into whole-stage codegen; no Python UDFs in
this module. The one inherently procedural kernel (offset-preserving
link removal, wikipedia.py:577-652) lives in
wikid_spark.operators.annotate as a pandas UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Brace-deletion unroll for clean_wikitext. The reference loops to a
# fixpoint (wikipedia.py:526-537); real wikitext nests a handful deep,
# so a bounded unroll keeps the whole chain in codegen. Round 13: each
# pass deletes balanced regions up to TWO nesting levels in one scan
# (possessive alternation — no backtracking), so TEMPLATE_UNROLL
# passes cover ~2x that depth at the cost of TEMPLATE_UNROLL full-text
# scans instead of the previous 10 single-level scans (the article
# profile put the brace passes at the top of the clean-chain wall).
# Deleting a balanced depth<=2 region == a sequence of innermost-pair
# deletions, and innermost redexes are disjoint, so the rewrite is
# confluent — any pass order reaches the reference's fixpoint, and
# rows nested deeper than the unroll still finish in
# operators.cleanup.clean_deep_templates' exact-fixpoint tail
# (byte-parity pinned by test_clean_wikitext_deep_nesting_fixpoint).
TEMPLATE_UNROLL = 4
_BRACE_DEPTH2 = r"\{(?:[^{}]++|\{[^{}]*+\})*+\}"

LINK_PATTERN = r"\[\[([^\[\]]*)\]\]"  # wikipedia.py:40


def capitalize_first(col: Column | str) -> Column:
    """Uppercase ONLY the first character, preserving the rest — unlike
    initcap, which lowercases the tail and splits words. Mirrors
    wikipedia.py:246-256 (_capitalize_first)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), None).otherwise(
        F.concat(F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 2147483646))
    )


def strip_anchor(col: Column | str) -> Column:
    """Drop a '#anchor' suffix (sub-page links): split('#')[0].
    Mirrors wikipedia.py:190-195."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "#", 1)


def extract_links(col: Column | str) -> Column:
    """All [[...]] interwiki-link bodies in a text column → array<string>.
    Mirrors the findall at wikipedia.py:204-210 (link_regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(LINK_PATTERN), F.lit(1))


def parse_link(body: Column) -> Column:
    """Parse one link body 'entity|alias' → struct(entity, alias).

    Rules (wikipedia.py:211-243):
      - whole body '_'→' ' and trimmed first (wikipedia.py:216 operates
        on the full match, alias included);
      - entity = text before the FIRST '|', trimmed, '#anchor' stripped;
      - alias  = the segment after the FIRST pipe — splits[1], so
        '[[a|b|c]]' yields 'b' (wikipedia.py:229-232) — trimmed;
      - no pipe → alias = the entity itself;
      - '[[Entity (spec)|]]' (empty alias, entity has a paren
        qualifier) → alias = entity text before '(';
      - empty alias with NO qualifier stays empty — the reference
        discards such links at store time (wikipedia.py:197), mirrored
        by the alias != '' filter downstream.
    """
    b = F.trim(F.regexp_replace(body, "_", " "))
    parts = F.split(b, r"\|")
    entity = strip_anchor(F.trim(parts.getItem(0)))
    has_pipe = b.contains("|")
    alias_raw = F.when(has_pipe, F.trim(parts.getItem(1))).otherwise(entity)
    spec_alias = F.trim(F.substring_index(entity, "(", 1))
    alias = F.when(
        (alias_raw == "") & entity.contains("("), spec_alias
    ).otherwise(alias_raw)
    return F.struct(entity.alias("entity"), alias.alias("alias"))


# First non-whitespace character is '*' or '#' — the reference's
# "enumeration sentence" test. Explicit ASCII class so the Spark (Java
# regex) and DuckDB (RE2) engines agree character-for-character.
ENUM_LEAD_PATTERN = r"^[ \t\n\x0B\f\r]*[*#]"


def is_valid_sentence(col: Column | str) -> Column:
    """Sentence validity gate [SURVEY F10]. Mirrors wikipedia.py:674-687
    exactly:

      - ``10 < len(sent_text) < 3000`` — both bounds EXCLUSIVE (len 10
        and len 3000 are invalid; 11 and 2999 are valid), measured on
        the RAW text, before any strip;
      - the STRIPPED text must not start with ``*`` or ``#``
        ("enumeration" sentences). Only the left strip matters for
        startswith, so the column form is one anchored regex: first
        non-whitespace char is */#.

    Whitespace is the ASCII class [ \\t\\n\\x0B\\f\\r]; the reference's
    str.strip() also strips Unicode whitespace — documented divergence,
    irrelevant on ASCII corpora and keeps the Spark and DuckDB regex
    engines identical. NULL input → NULL (filters drop it, matching the
    reference which never sees None)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return (n > 10) & (n < 3000) & ~c.rlike(ENUM_LEAD_PATTERN)


def clean_wikitext(col: Column | str) -> Column:
    """Wikitext → plain text. Mirrors the cleanup chain at
    wikipedia.py:515-574: bold/italic quotes, nested {{templates}} and
    {|tables|} to a bounded fixpoint, HTML comments, Category/File
    links, ==headings==, <ref> spans, html entities, space collapse."""
    c = F.col(col) if isinstance(col, str) else col
    # balanced-brace deletion, unrolled: each pass removes complete
    # {...} / {{...}} regions up to two nesting levels (see
    # _BRACE_DEPTH2 note on TEMPLATE_UNROLL).
    for _ in range(TEMPLATE_UNROLL):
        c = F.regexp_replace(c, _BRACE_DEPTH2, "")
    c = F.regexp_replace(c, r"'''", "")
    c = F.regexp_replace(c, r"''", "")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, r"\[\[(?:Category|File|Image):[^\[\]]*\]\]", "")
    c = F.regexp_replace(c, r"==+[^=]*==+", "")
    c = F.regexp_replace(c, r"(?s)<ref[^>]*/>", "")
    c = F.regexp_replace(c, r"(?s)<ref[^>]*>.*?</ref>", "")
    c = F.regexp_replace(c, r"</?blockquote>", "")
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&amp;nbsp;"), F.lit(" "))
    c = F.replace(c, F.lit("&amp;"), F.lit("&"))
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def truncate_on_word(col: Column | str, n_chars: int = 1000) -> Column:
    """Truncate to n_chars, fix stray punctuation, then drop the final
    word. Mirrors wikipedia.py:361-381 [L2, X9] exactly: the punctuation
    replacements run on the SLICED text before the word drop, and the
    last word is dropped unconditionally — even when the text is under
    the limit (' '.join(text.split(' ')[:-1]))."""
    c = F.col(col) if isinstance(col, str) else col
    cut = F.substring(c, 1, n_chars)
    for lit, rep in [("(;", " "), ("(,", " "), (" ; ", " "), (" , ", ""), ("()", "")]:
        cut = F.replace(cut, F.lit(lit), F.lit(rep))
    words = F.split(cut, " ")
    return F.array_join(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))), " "
    )
