"""Offset-preserving link removal (SURVEY.md X4, U1).

Reproduces the behavior of the reference's char-level link scanner
(wikipedia.py:577-652 in /root/reference/scripts/wiki/): given cleaned
wikitext, produce (a) the text with every well-formed ``[[...]]`` link
replaced by its mention and (b) ``(mention, entity_title, start, end)``
character-offset annotations into that final text. Constructs the
reference treats as special cases contribute NOTHING to the output
text: nesting deeper than two brackets (``[[File:x|[[y]]]]``), an
entity containing ``#`` or starting with ``:``, or a second ``|``
inside one link.

This is the engine's one genuinely procedural kernel — offsets depend
on every preceding character, so it runs as an Arrow-batched pandas UDF
(row loop in Python, transfer vectorized). Everything around it stays
JVM-side.

Scale note: the reference resolves entity_title → QID inside the scan
via an in-memory dict (unbounded driver state). Here the UDF emits the
*title* and resolution is a downstream broadcast join
(``resolve_annotations``) — no per-executor giant dict, and the join
participates in AQE like any other.
"""

from __future__ import annotations

import re
import sys

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ANNOTATION = StructType(
    [
        StructField("mention", StringType()),
        StructField("entity_title", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]
)
LINKFREE = StructType(
    [
        StructField("text", StringType()),
        StructField("annotations", ArrayType(ANNOTATION)),
    ]
)

# Python workers don't share the driver's sys.path — the driver may
# import this package from an arbitrary directory (the harness does a
# bare sys.path.insert). Serialize this module's functions by VALUE so
# the UDF travels inside the task closure instead of requiring
# `import wikid_spark` on every worker.
# NOTE: must be pyspark's VENDORED cloudpickle — the serializer uses
# pyspark.cloudpickle, so registering with the standalone package has
# no effect on task pickling.
from pyspark import cloudpickle  # noqa: E402

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# Scanner states while inside a [[...]] construct.
_TEXT, _ENTITY, _MENTION = 0, 1, 2


def strip_links_one(text: str):
    """Pure-Python kernel for one document. Mirrors the state
    transitions of wikipedia.py:577-652; '[' / ']' characters are
    always consumed, a bare '|' outside links passes through."""
    if text is None:
        return None, None
    out: list[str] = []
    out_len = 0
    anns: list[tuple[str, str, int, int]] = []
    depth = 0
    state = _TEXT
    entity: list[str] = []
    mention: list[str] = []
    special = False
    for ch in text:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "|":
            if state == _TEXT:
                out.append(ch)
                out_len += 1
            elif state == _ENTITY:
                state = _MENTION
            else:  # second pipe inside one link
                special = True
        else:
            if state == _ENTITY:
                entity.append(ch)
            elif state == _MENTION:
                mention.append(ch)
            else:
                out.append(ch)
                out_len += 1
        if depth > 2:
            special = True
        if depth == 2 and state == _TEXT:
            state = _ENTITY
        if depth == 0 and state != _TEXT:
            ent = "".join(entity)
            men = "".join(mention) or ent
            if not special and "#" not in ent and not ent.startswith(":"):
                # empty mention ([[|]]) contributes no text and no
                # annotation — keeps the 0 <= start < end invariant
                # (the reference's qid-lookup gate drops it too).
                if men:
                    anns.append((men, ent, out_len, out_len + len(men)))
                    out.append(men)
                    out_len += len(men)
            entity.clear()
            mention.clear()
            state = _TEXT
            special = False
    return "".join(out), anns


_STRUCT_TEXT = re.compile(r"[\[\]]")
_STRUCT_LINK = re.compile(r"[\[\]|]")


def strip_links_one_chunked(text: str):
    """Chunked twin of `strip_links_one`: identical state machine at
    every structural character ('[', ']', and — inside a link — '|'),
    but the runs BETWEEN structural characters bulk-copy via regex
    search instead of stepping the Python interpreter per character
    (the round-13 article-pass profile put the per-char loop at ~1/3
    of the warm stage wall). Safe because none of the loop's post-char
    transitions (depth>2, depth==2 entry, depth==0 close) can fire
    inside a structural-free run — depth and state only change at
    structural characters. Output equality with the per-char kernel is
    property-tested on random bracket soup."""
    if text is None:
        return None, None
    out: list[str] = []
    out_len = 0
    anns: list[tuple[str, str, int, int]] = []
    depth = 0
    state = _TEXT
    entity: list[str] = []
    mention: list[str] = []
    special = False
    pos = 0
    n = len(text)
    while pos < n:
        pat = _STRUCT_TEXT if state == _TEXT else _STRUCT_LINK
        m = pat.search(text, pos)
        end = m.start() if m else n
        if end > pos:
            chunk = text[pos:end]
            if state == _ENTITY:
                entity.append(chunk)
            elif state == _MENTION:
                mention.append(chunk)
            else:
                out.append(chunk)
                out_len += len(chunk)
        if m is None:
            break
        ch = m.group()
        pos = m.end()
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        else:  # '|' — only structural outside _TEXT
            if state == _ENTITY:
                state = _MENTION
            else:
                special = True
        if depth > 2:
            special = True
        if depth == 2 and state == _TEXT:
            state = _ENTITY
        if depth == 0 and state != _TEXT:
            ent = "".join(entity)
            men = "".join(mention) or ent
            if not special and "#" not in ent and not ent.startswith(":"):
                if men:
                    anns.append((men, ent, out_len, out_len + len(men)))
                    out.append(men)
                    out_len += len(men)
            entity.clear()
            mention.clear()
            state = _TEXT
            special = False
    return "".join(out), anns


@F.pandas_udf(LINKFREE)
def strip_links(texts: pd.Series) -> pd.DataFrame:
    rows = [strip_links_one_chunked(t) for t in texts]
    return pd.DataFrame(
        {"text": [r[0] for r in rows], "annotations": [r[1] for r in rows]}
    )


def annotate(df: DataFrame, text_col: str) -> DataFrame:
    """Add ``clean_text`` + ``annotations`` columns for ``text_col``."""
    parsed = F.col("_lf")
    return (
        df.withColumn("_lf", strip_links(F.col(text_col)))
        .withColumn("clean_text", parsed["text"])
        .withColumn("annotations", parsed["annotations"])
        .drop("_lf")
    )


def resolve_annotations(
    annotated: DataFrame, id_col: Column, title_to_id: DataFrame
) -> DataFrame:
    """Explode annotations and resolve entity_title → qid against the
    ``title_to_id(name, entity_id)`` dimension (broadcast — it is the
    reference's in-memory dict, wikipedia.py:62-81, kept as a proper
    dimension table). Unresolvable titles are dropped, matching the
    reference's ``if qid`` guard (wikipedia.py:634-637)."""
    exploded = annotated.select(
        id_col.alias("doc_key"), F.explode("annotations").alias("a")
    )
    return (
        exploded.join(
            F.broadcast(title_to_id),
            exploded["a.entity_title"] == title_to_id["name"],
            "inner",
        )
        .select(
            "doc_key",
            F.col("a.mention").alias("mention"),
            F.col("entity_id").alias("qid"),
            F.col("a.start").alias("start"),
            F.col("a.end").alias("end"),
        )
    )
