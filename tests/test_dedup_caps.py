"""Behavioral contract of the hot-shingle df-cap (JACCARD_DF_CAP).

The registered query's oracle never exercises the cap (max df 25 at
sf0.1 vs cap 1000), so this pins the DOCUMENTED semantics with a corpus
where the cap actually fires: a boilerplate shingle shared by every doc
(a licence header) exceeds the cap and is dropped from candidate
generation, while denominators stay exact from the pre-cap table.
"""

from __future__ import annotations

from wikid_spark.queries.dedup import ngram_jaccard_pairs


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}


def test_df_cap_drops_boilerplate_only_pairs_keeps_lower_bound(spark):
    # Every doc opens with the same 3-token boilerplate ("creative
    # commons license" → one hot shingle, df = 8). Docs 1-6 share ONLY
    # that shingle; docs 7/8 also share real content.
    docs = spark.createDataFrame(
        [(i, f"creative commons license x{i}") for i in range(1, 7)]
        + [
            (7, "creative commons license alpha beta gamma"),
            (8, "creative commons license alpha beta delta"),
        ],
        "doc_id long, text string",
    )

    uncapped = _pairs(ngram_jaccard_pairs(docs, df_cap=10**9))
    capped = _pairs(ngram_jaccard_pairs(docs, df_cap=3))

    # Uncapped exact reference: 15 boilerplate-only pairs among docs
    # 1-6 (1 shared of 2 shingles each → 1/3), 12 boilerplate-only
    # cross pairs to docs 7/8 (1/(2+4-1) = 0.2, exactly at threshold),
    # + the one real pair.
    assert uncapped[(7, 8)] == 0.6
    assert all(
        uncapped[(a, b)] == 0.3333
        for a in range(1, 7)
        for b in range(a + 1, 7)
    )
    assert all(
        uncapped[(a, b)] == 0.2 for a in range(1, 7) for b in (7, 8)
    )
    assert len(uncapped) == 28

    # Cap fired: pairs overlapping ONLY through the hot shingle vanish
    # (boilerplate-only matches are the ones a dedup pass should skip).
    assert set(capped) == {(7, 8)}

    # Surviving pairs: denominator exact (pre-cap sizes), intersection
    # missing only hot shingles → value is a LOWER BOUND of the exact
    # Jaccard and still clears the threshold here.
    # doc7/doc8: 4 shingles each, 3 shared; hot one removed → 2/(4+4-2).
    assert capped[(7, 8)] == 0.3333
    assert capped[(7, 8)] <= uncapped[(7, 8)]


def test_df_cap_noop_when_no_shingle_exceeds_it(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    assert _pairs(ngram_jaccard_pairs(docs, df_cap=2)) == _pairs(
        ngram_jaccard_pairs(docs, df_cap=10**9)
    )


def test_hot_shingle_aggregation_is_bounded_and_survives_1e5_df(spark):
    """VERDICT r16 #2: a shingle with document frequency 10^5 (100x the
    cap) must not materialize its full posting list in one aggregation
    buffer. The plan must truncate postings BEFORE the collect_list
    (streaming row_number + rn <= cap+1 filter below the aggregate),
    and the query must complete with the hot shingle dropped while
    real near-dup pairs survive with exact denominators."""
    n = 100_000
    docs = spark.createDataFrame(
        [(i, f"common hot shingle x{i}") for i in range(n)]
        + [
            (n + 1, "alpha beta gamma delta epsilon"),
            (n + 2, "alpha beta gamma delta zeta"),
        ],
        "doc_id long, text string",
    )
    df = ngram_jaccard_pairs(docs)  # default cap 1000 << df 100k
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    agg_idx = [i for i, ln in enumerate(lines) if "collect_list" in ln]
    win_idx = [i for i, ln in enumerate(lines) if "row_number" in ln]
    flt_idx = [i for i, ln in enumerate(lines) if "Filter" in ln and "1001" in ln]
    assert agg_idx and win_idx and flt_idx, plan[:4000]
    # top-down print: the bounding filter + window sit BELOW the
    # posting-list aggregate (truncation happens before collection)
    assert agg_idx[0] < flt_idx[0] < max(win_idx), plan[:4000]

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}
    # every cross-pair shares ONLY the over-cap boilerplate shingle →
    # dropped; the one real pair survives: docs n+1/n+2 have 3 shingles
    # each, 2 shared → 2/(3+3-2) = 0.5
    assert got == {(n + 1, n + 2): 0.5}


def test_pack_overflow_raises_instead_of_corrupting(spark):
    """ADVICE r16: a doc_id outside the 2^42 packing budget must fail
    loudly (raise_error in the pack projection), never silently corrupt
    pair ids / denominators."""
    import pytest

    docs = spark.createDataFrame(
        [
            (1 << 42, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta zeta"),
        ],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="pack overflow"):
        ngram_jaccard_pairs(docs).collect()
