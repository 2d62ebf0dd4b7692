"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This is the local mirror of the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from wikid_spark.oracle import compare
from wikid_spark.registry import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    if spec.oracle is None:
        # Weaker rows-only check (mirrors driver behavior for non-SQL ops).
        assert df.count() >= 0
        return
    ok, diag = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {diag}"


def test_shingle_short_doc_parity(spark, tmp_path):
    """Docs with <3 words take the whole-text-shingle fallback on BOTH
    engines (round-1 latent divergence: the oracle comprehension dropped
    them, masked because the corpora have no short docs)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        os.symlink(f"/root/testdata/sf0.01/{t}.parquet", d / f"{t}.parquet")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "text": pa.array(
                [
                    "tiny doc",          # 2 words — fallback shingle
                    "tiny doc",          # identical short dup → pair (1,2)
                    "solo",              # 1 word — fallback shingle
                    "a b c d e f",       # normal doc
                    "a b c d e g",       # near-dup of 4
                    "",                  # empty — zero tokens
                    "   ",               # whitespace-only — zero tokens
                ]
            ),
            "lang": pa.array(["en"] * 7),
            "source": pa.array(["t"] * 7),
            "n_chars": pa.array([8, 8, 4, 11, 11, 0, 3], pa.int64()),
        }
    )
    pq.write_table(docs, d / "documents.parquet")
    # dedup family: short-doc fallback; pipeline family: the zero-token
    # docs must neither crash Spark (sequence(0,-1) guard) nor diverge
    # from the oracle's emit-no-rows behavior.
    for name in ("nd_ngram_jaccard", "nd_minhash_signatures",
                 "nd_minhash_lsh_candidates", "pp_chunking",
                 "pp_repetition", "pp_gopher_filter"):
        spec = SPECS[name]
        ok, diag = compare(spec.fn(spark, str(d)), spec.oracle, str(d))
        assert ok, f"{name}: {diag}"
    # the identical 2-word docs must surface as an exact-Jaccard pair
    rows = SPECS["nd_ngram_jaccard"].fn(spark, str(d)).collect()
    assert any(r["doc_a"] == 1 and r["doc_b"] == 2 and r["jaccard"] == 1.0
               for r in rows)
