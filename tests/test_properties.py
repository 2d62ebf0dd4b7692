"""Property-based tests (hypothesis) for the procedural kernels and
pipeline invariants (SURVEY.md §5.4, FIXTURES.md §2.3).

These run driver-side against the pure-Python kernel functions — no
Spark jobs — so hypothesis can explore thousands of cases cheaply. The
Spark wrappers around the same functions are exercised by the golden
pipeline tests.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from wikid_spark.operators.annotate import (
    strip_links_one,
    strip_links_one_chunked,
)
from wikid_spark.plans.kb import fake_encoder
from wikid_spark.queries.dedup import _perm_a, _perm_b, H_MOD, N_PERM, PERM_P

# Text alphabet that includes the link-syntax metacharacters heavily.
LINKY = st.text(alphabet="ab |[]#:()", max_size=80)
PLAIN = st.text(
    alphabet=st.characters(blacklist_characters="[]|", blacklist_categories=("Cs",)),
    max_size=40,
)


@given(LINKY)
@settings(max_examples=500, deadline=None)
def test_strip_links_never_crashes_and_offsets_valid(text):
    out, anns = strip_links_one(text)
    assert out is not None
    for mention, _entity, start, end in anns:
        assert 0 <= start < end <= len(out)
        assert out[start:end] == mention


@given(PLAIN, PLAIN)
@settings(max_examples=200, deadline=None)
def test_strip_links_wellformed_piped(entity, mention):
    """[[entity|mention]] in plain text → mention inlined + annotated
    (unless the reference's special-case rules drop it)."""
    text = f"x [[{entity}|{mention}]] y"
    out, anns = strip_links_one(text)
    special = "#" in entity or entity.startswith(":")
    if special or (not entity and not mention):
        assert anns == []
    else:
        expected_mention = mention or entity
        assert anns == [(expected_mention, entity, 2, 2 + len(expected_mention))]
        assert out == f"x {expected_mention} y"


@given(st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_text_without_links_passes_through(text):
    clean = text.replace("[", "").replace("]", "")
    out, anns = strip_links_one(clean)
    assert out == clean and anns == []


@given(LINKY)
@settings(max_examples=1000, deadline=None)
def test_strip_links_chunked_equals_char_loop(text):
    """The production chunked kernel (round-13 article-pass speedup)
    must be output-identical — text AND annotations — to the per-char
    reference state machine on arbitrary bracket soup, including
    unbalanced/degenerate inputs."""
    assert strip_links_one_chunked(text) == strip_links_one(text)
    assert strip_links_one_chunked(None) == strip_links_one(None)


def test_strip_links_chunked_equals_char_loop_realistic():
    """Longer realistic articles with mixed links, tables residue, and
    multibyte text — the shapes hypothesis's short soup misses."""
    cases = [
        "The [[Amber basalt 3|city]] lies on [[Cedar delta 7]] near x.",
        "a [[File:x|[[y]]]] deep-nest special " * 50,
        "pipes | outside [[links|stay]] and [[two|pipes|special]] z",
        "unclosed [[entity and ]] stray ] plus [ single",
        "[[Colon:ok|m]] [[:leading|m]] [[has#hash|m]] tail",
        "ünïcödé [[Tëst|mëntïon]] — emoji 🎉 [[E|🎊]] end " * 20,
        "",
    ]
    for text in cases:
        assert strip_links_one_chunked(text) == strip_links_one(text)


@given(st.integers(min_value=0, max_value=H_MOD - 1))
@settings(max_examples=200, deadline=None)
def test_minhash_permutations_stay_in_bigint(h):
    """The universal-hash arithmetic must never overflow DuckDB's
    BIGINT (it errors; Spark silently wraps — a parity trap)."""
    for i in range(N_PERM):
        v = h * _perm_a(i) + _perm_b(i)
        assert 0 <= v < 2**63
        assert 0 <= v % PERM_P < PERM_P


@given(st.lists(st.text(max_size=20), min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_fake_encoder_deterministic_fixed_dim(texts):
    a = fake_encoder(texts)
    b = fake_encoder(texts)
    assert a == b
    assert all(len(v) == 64 for v in a)
    assert all(-1.0 <= x <= 1.0 for v in a for x in v)


@given(st.floats(min_value=-10.0, max_value=10.0, allow_nan=False))
@settings(max_examples=500, deadline=None)
def test_quantize_formula_engine_portable(x):
    """The fixed-point quantization both engines compute —
    floor(float32(x) · 1000.0) — must stay integral, bounded, and
    exactly reproducible from the float32 value (no double-rounding
    ambiguity), which is what makes LSH/IVF sign tests engine-exact."""
    import math
    import struct

    f32 = struct.unpack("f", struct.pack("f", x))[0]  # what parquet stores
    q = math.floor(f32 * 1000.0)
    assert q == int(q)
    assert -10_001_000 <= q <= 10_001_000
    # idempotent: recomputing from the same stored float gives the same q
    assert q == math.floor(struct.unpack("f", struct.pack("f", x))[0] * 1000.0)


@given(st.integers(min_value=1, max_value=500))
@settings(max_examples=300, deadline=None)
def test_chunk_grid_covers_every_token(n):
    """The chunk-start grid 0, STEP, 2·STEP… with CHUNK-sized windows
    covers [0, n) for every document length (the invariant pp_chunking
    relies on; driver-side mirror of the Spark sequence/slice pair)."""
    from wikid_spark.queries.pipeline import CHUNK, STEP

    starts = list(range(0, n, STEP))
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + CHUNK, n)))
    assert covered == set(range(n))
    # every chunk except possibly the last is full while n allows it
    assert all(min(s + CHUNK, n) - s > 0 for s in starts)


@given(
    st.lists(
        st.tuples(st.floats(1, 100, allow_nan=False), st.floats(0.1, 10, allow_nan=False)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=300, deadline=None)
def test_weighted_median_kernel_invariants(pairs):
    """Lower weighted median is one of the input values, and at least
    half the total weight sits at or above it."""
    import pandas as pd

    from wikid_spark.functions.udaf import weighted_median

    vs = pd.Series([v for v, _ in pairs])
    ws = pd.Series([w for _, w in pairs])
    m = weighted_median.func(vs, ws)
    assert m in set(vs)
    total = float(ws.sum())
    at_or_below = float(ws[vs <= m].sum())
    assert at_or_below >= total / 2.0 - 1e-9
