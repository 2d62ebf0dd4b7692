#!/usr/bin/env python
"""Synthetic Wikimedia dump generator for the ETL throughput benchmark.

The reference's only published performance figures are full-dump parse
throughputs (BASELINE.md: ~1,530-2,180 entity lines/s for the Wikidata
NDJSON pass, ~102k-153k XML lines/s for the Wikipedia prior pass —
/root/reference/scripts/wiki/wikidata.py:69-70, wikipedia.py:92-93).
Binding those numbers needs dump-shaped inputs at meaningful size;
this tool writes them deterministically (fixed per-shard seeds — same
args, byte-identical corpus) so `bench.py --etl` is reproducible.

Shapes mirror what the real dumps stress in the parsers:

* **Wikidata**: the JSON-array wrapper (``[`` / ``]`` lines, trailing
  commas per entity line — wikidata.py:106-108), entities with typed
  nested claims (P31/P279 arrays incl. deprecated-rank and
  novalue-snak edge cases), sitelinks/labels/descriptions/aliases in
  several languages, a minority of non-item types, and a few percent
  of meta-QID P31 hits so the negative filter has work to do.
* **Wikipedia**: ``<page>`` records inside a ``<mediawiki>`` root with
  page-level ``<id>`` AND revision-level ``<id>`` (the scope rule),
  wikitext with plain/piped/anchored ``[[links]]``, templates,
  meta-namespace pages, #REDIRECT pages, and a dev-split id tail.

Output is SHARDED (one file per worker task, round-robin rows) —
the re-chunked landing zone a 100 TB dump needs anyway, and what lets
local[32] parallelize the scan. Line counts are exact in
``manifest.json``; throughput = manifest lines / stage wall-clock.

Usage:  python tools/gen_dumps.py OUT_DIR [--entities N] [--pages N]
        [--shards N]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
from multiprocessing import Pool

META_QIDS = ("Q4167836", "Q4167410", "Q13406463", "Q11266439")
GOOD_QIDS = ("Q5", "Q515", "Q6256", "Q11424", "Q7889", "Q482994")
WORDS = (
    "amber basalt cedar delta ember fjord granite harbor indigo juniper "
    "krypton lagoon marble nectar onyx prairie quartz ridge summit tundra "
    "umber vertex willow xenon yonder zephyr cobalt drift echo flint"
).split()
LANGS = ("en", "de", "fr", "nl", "es")


def _title(i: int) -> str:
    return (
        f"{WORDS[i % len(WORDS)].capitalize()} "
        f"{WORDS[(i // len(WORDS)) % len(WORDS)]} {i}"
    )


def _entity(i: int, rng: random.Random) -> dict:
    qid = f"Q{100 + i}"
    claims: dict = {}
    p31 = []
    r = rng.random()
    if r < 0.04:
        # meta-QID hit -> excluded by F2 (unless deprecated-rank)
        rank = "deprecated" if rng.random() < 0.2 else "normal"
        p31.append(
            {
                "mainsnak": {
                    "datavalue": {"value": {"id": rng.choice(META_QIDS)}}
                },
                "rank": rank,
            }
        )
    elif r < 0.07:
        # novalue/somevalue snak: no datavalue id at all
        p31.append({"mainsnak": {}, "rank": "normal"})
    else:
        p31.append(
            {
                "mainsnak": {
                    "datavalue": {"value": {"id": rng.choice(GOOD_QIDS)}}
                },
                "rank": "normal",
            }
        )
    claims["P31"] = p31
    if rng.random() < 0.5:
        claims["P279"] = [
            {
                "mainsnak": {
                    "datavalue": {"value": {"id": rng.choice(GOOD_QIDS)}}
                },
                "rank": "normal",
            }
        ]
    # a linking property the edge explode walks
    claims["P361"] = [
        {
            "mainsnak": {
                "datavalue": {"value": {"id": f"Q{100 + rng.randrange(50000)}"}}
            },
            "rank": "normal",
        }
    ]
    # Bulk realism: most of a real entity line is claims the parser
    # SKIPS (string/quantity/time datavalues, references, qualifiers)
    # plus labels in dozens of languages. Real latest-all.json lines
    # average several KB; without this baggage a lines/s comparison
    # against the reference's full-dump numbers would flatter us.
    for p in range(5 + rng.randrange(10)):
        claims[f"P{1000 + p}"] = [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": f"P{1000 + p}",
                    "datavalue": {
                        "value": " ".join(
                            rng.choice(WORDS) for _ in range(6)
                        ),
                        "type": "string",
                    },
                },
                "type": "statement",
                "rank": "normal",
                "references": [
                    {
                        "snaks": {
                            "P248": [
                                {
                                    "snaktype": "value",
                                    "datavalue": {
                                        "value": {"id": f"Q{rng.randrange(10**7)}"},
                                        "type": "wikibase-entityid",
                                    },
                                }
                            ]
                        }
                    }
                ],
            }
        ]
    title = _title(i)
    w = [rng.choice(WORDS) for _ in range(8)]
    extra_langs = (
        "de fr nl es it pt sv pl ru ja zh ar fi no da cs hu tr ko he"
    ).split()
    ent = {
        "type": "item" if rng.random() < 0.9 else "property",
        "id": qid,
        "labels": {
            lang: {"language": lang, "value": f"{title} ({lang})"}
            for lang in (["en"] + extra_langs)[: 1 + rng.randrange(20)]
        },
        "descriptions": {
            "en": {"language": "en", "value": " ".join(w)}
        },
        "aliases": {
            "en": [
                {"language": "en", "value": f"{w[0]} {w[1]}"},
                {"language": "en", "value": f"the {w[2]}"},
            ][: 1 + rng.randrange(2)]
        },
        "claims": claims,
        "sitelinks": dict(
            (
                {"enwiki": {"site": "enwiki", "title": title}}
                if rng.random() < 0.7
                else {}
            ),
            **{
                f"{lg}wiki": {"site": f"{lg}wiki", "title": f"{title} ({lg})"}
                for lg in extra_langs[: rng.randrange(12)]
            },
        ),
        # realistic extra baggage the schema prunes at parse time
        "lastrevid": 1_000_000 + i,
        "modified": "2024-01-01T00:00:00Z",
    }
    return ent


def _gen_wikidata_shard(args) -> int:
    out_path, shard, shards, n_entities = args
    rng = random.Random(0xE17 + shard)
    lines = 0
    with open(out_path, "w") as f:
        f.write("[\n")
        lines += 1
        for i in range(shard, n_entities, shards):
            f.write(json.dumps(_entity(i, rng), separators=(",", ":")))
            f.write(",\n")
            lines += 1
        f.write("]\n")
        lines += 1
    return lines


def _page_text(i: int, rng: random.Random, n_entities: int) -> str:
    """Wikitext with link styles the X1/X2/X5 kernels must handle,
    spread over many physical lines (the reference's metric is raw
    XML LINES, so line shape matters).

    Realism matches a typical mainspace article so the article-text
    stage benches the X3 fixpoint and X4 offsets at honest cost, not
    toy cost (round-8 verdict #7): the infobox nests templates to
    depth 3 ({{Infobox → {{formatnum → {{#expr}}}}); sentences carry
    inline <ref>{{cite web}}</ref> spans (~6-10/article, nesting a
    template INSIDE the ref) and self-closing <ref name=/>; HTML
    comments (with braces inside — the comment strip must not confuse
    the template fixpoint); [[File:...|thumb|...]] with pipes in the
    caption; and a 2-5 row [[Category:...]] block at the end."""
    parts = [
        "{{Infobox thing\n| name = %s\n| kind = %s\n"
        "| pop = {{formatnum|{{#expr:%d * 1000}}}}\n"
        "| area = {{convert|%d|km2|sqmi|abbr=on}}\n}}"
        % (_title(i), rng.choice(WORDS), rng.randrange(1, 500), rng.randrange(1, 900))
    ]
    ref_n = 0
    for _ in range(rng.randrange(4, 10)):
        tgt = _title(rng.randrange(n_entities))
        style = rng.random()
        if style < 0.4:
            link = f"[[{tgt}]]"
        elif style < 0.7:
            link = f"[[{tgt}|the {rng.choice(WORDS)}]]"
        elif style < 0.85:
            link = f"[[{tgt}#History|{rng.choice(WORDS)}]]"
        else:
            link = f"[[{tgt.replace(' ', '_')}]]"
        sent = " ".join(rng.choice(WORDS) for _ in range(10))
        r = rng.random()
        if r < 0.55:
            ref_n += 1
            ref = (
                f'<ref name="r{ref_n}">{{{{cite web |title={rng.choice(WORDS)} '
                f"|url=http://example.org/{ref_n} |access-date=2024-01-01}}}}</ref>"
            )
        elif r < 0.7 and ref_n:
            ref = f'<ref name="r{rng.randrange(1, ref_n + 1)}" />'
        else:
            ref = ""
        parts.append(f"The {sent} includes {link} notably.{ref}")
        if rng.random() < 0.2:
            parts.append(
                f"[[File:{_title(rng.randrange(n_entities)).replace(' ', '_')}.jpg"
                f"|thumb|right|A {rng.choice(WORDS)} specimen]]"
            )
        if rng.random() < 0.15:
            parts.append(
                f"<!-- TODO: verify {{{{date|{rng.choice(WORDS)}}}}} -->"
            )
    parts.append("== See also ==")
    parts.append(f"* [[{_title(rng.randrange(n_entities))}]]")
    for _ in range(rng.randrange(2, 6)):
        parts.append(f"[[Category:{rng.choice(WORDS).capitalize()} topics]]")
    return "\n".join(parts)


def _gen_wikipedia_shard(args) -> int:
    out_path, shard, shards, n_pages, n_entities = args
    rng = random.Random(0x91A + shard)
    lines = 0

    def w(f, s: str) -> None:
        nonlocal lines
        f.write(s)
        lines += s.count("\n")

    with open(out_path, "w") as f:
        w(f, '<mediawiki xml:lang="en">\n')
        for i in range(shard, n_pages, shards):
            r = rng.random()
            if r < 0.05:
                title = f"Template:{WORDS[i % len(WORDS)]} {i}"
                text = "{{documentation}}"
            elif r < 0.08:
                title = _title(i)
                text = f"#REDIRECT [[{_title(rng.randrange(n_entities))}]]"
            elif r < 0.10:
                title = _title(i)
                text = "This page is a disambiguation list.\n* item"
            else:
                # entity-aligned article (joins to entity_texts.name)
                title = _title(i)
                text = _page_text(i, rng, n_entities)
            text = (
                text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            )
            esc_title = (
                title.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            )
            w(f, "  <page>\n")
            w(f, f"    <title>{esc_title}</title>\n")
            w(f, "    <ns>0</ns>\n")
            w(f, f"    <id>{10_000 + i}</id>\n")
            w(f, "    <revision>\n")
            w(f, f"      <id>{90_000_000 + i}</id>\n")
            w(f, "      <timestamp>2024-01-01T00:00:00Z</timestamp>\n")
            w(f, f'      <text bytes="{len(text)}">{text}</text>\n')
            w(f, "    </revision>\n")
            w(f, "  </page>\n")
        w(f, "</mediawiki>\n")
    return lines


def generate(
    out_dir: str,
    n_entities: int = 400_000,
    n_pages: int = 150_000,
    shards: int = 32,
    workers: int | None = None,
) -> dict:
    """Write both dumps + manifest.json; returns the manifest dict.
    Idempotent fast-path: an existing manifest with matching params is
    reused (the corpus is deterministic)."""
    manifest_path = os.path.join(out_dir, "manifest.json")
    params = {
        "n_entities": n_entities,
        "n_pages": n_pages,
        "shards": shards,
        "version": 4,  # r9: realistic wikitext (refs/files/categories/nested templates)
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("params") == params:
            return m
    wd_dir = os.path.join(out_dir, "wikidata")
    wp_dir = os.path.join(out_dir, "wikipedia")
    os.makedirs(wd_dir, exist_ok=True)
    os.makedirs(wp_dir, exist_ok=True)
    wd_args = [
        (os.path.join(wd_dir, f"part-{s:04d}.json"), s, shards, n_entities)
        for s in range(shards)
    ]
    wp_args = [
        (
            os.path.join(wp_dir, f"part-{s:04d}.xml"),
            s,
            shards,
            n_pages,
            n_entities,
        )
        for s in range(shards)
    ]
    with Pool(workers or min(shards, os.cpu_count() or 4)) as pool:
        wd_lines = sum(pool.map(_gen_wikidata_shard, wd_args))
        wp_lines = sum(pool.map(_gen_wikipedia_shard, wp_args))
    manifest = {
        "params": params,
        "wikidata_lines": wd_lines,
        "wikipedia_lines": wp_lines,
        "wikidata_path": wd_dir,
        "wikipedia_path": wp_dir,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--entities", type=int, default=400_000)
    ap.add_argument("--pages", type=int, default=150_000)
    ap.add_argument("--shards", type=int, default=32)
    args = ap.parse_args()
    m = generate(args.out_dir, args.entities, args.pages, args.shards)
    print(json.dumps(m))


if __name__ == "__main__":
    sys.exit(main())
