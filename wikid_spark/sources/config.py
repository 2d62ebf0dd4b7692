"""Config loaders (SURVEY.md S3): skip-term YAML and filter-term text.

The reference loads per-language skip terms from a YAML mapping
(scripts/wiki/wikipedia.py:317-320, configs/skip_terms.yaml) and flat
filter terms from a text file (scripts/utils.py:23-30). These are
driver-side config reads by nature — the lists are a handful of strings
that become broadcast literals in the plans (plans/wiki.py uses them as
an array literal), never distributed data.
"""

from __future__ import annotations

from pathlib import Path


def load_skip_terms(path: str | Path, lang: str) -> list[str]:
    """Per-language skip terms from a YAML mapping ``lang -> [terms]``
    (wikipedia.py:317-320 semantics: lower-cased containment terms).
    Returns a sorted, lower-cased, de-duplicated list so downstream
    plans are deterministic regardless of file order."""
    import yaml  # deferred: config loading is optional at runtime

    with open(path, "r", encoding="utf-8") as fh:
        data = yaml.safe_load(fh)
    if not isinstance(data, dict) or lang not in data:
        raise KeyError(f"no skip terms for language {lang!r} in {path}")
    return sorted({str(t).lower() for t in data[lang]})


def load_filter_terms(path: str | Path) -> set[str]:
    """Flat newline-delimited filter terms (utils.py:23-30 semantics:
    strip the newline, keep everything else verbatim)."""
    with open(path, "r", encoding="utf-8") as fh:
        return {line.replace("\n", "") for line in fh}
