"""Property tests for the training-data pipeline ops (queries/pipeline.py).

The oracle harness (test_oracle.py) proves Spark==DuckDB; these prove
the SEMANTICS are right — coverage, conservation, and distribution
properties that both engines could get identically wrong.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wikid_spark.queries import pipeline as pp
from wikid_spark.registry import all_queries

SF_DIR_SMALL = "/root/testdata/sf0.001"
SPECS = all_queries()


@pytest.fixture(scope="module")
def toks(spark):
    return pp._toks(spark, SF_DIR_SMALL).cache()


def test_chunking_covers_every_token(spark, toks):
    """Union of [start, start+CHUNK) windows covers [0, n) for every doc."""
    chunks = SPECS["pp_chunking"].fn(spark, SF_DIR_SMALL)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_pos") + F.col("n_chunk_tokens")).alias("covered"),
        F.max("n_chunk_tokens").alias("max_chunk"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    joined = per_doc.join(
        toks.select("doc_id", F.size("ts").alias("n")), "doc_id", "full"
    )
    bad = joined.filter(
        (F.col("covered") != F.col("n")) | (F.col("max_chunk") > pp.CHUNK)
    )
    assert bad.count() == 0
    # stride < chunk → consecutive chunks overlap by CHUNK - STEP
    assert pp.STEP < pp.CHUNK


def test_packing_conserves_tokens(spark, toks):
    """Per-source pack token totals must equal the source's corpus total,
    and pack ids must start at 0 (no empty leading packs)."""
    packs = SPECS["pp_pack_sequences"].fn(spark, SF_DIR_SMALL)
    per_source = packs.groupBy("source").agg(
        F.sum("pack_tokens").alias("packed"),
        F.min("pack_id").alias("first_pack"),
    )
    truth = toks.groupBy("source").agg(F.sum(F.size("ts")).alias("total"))
    joined = per_source.join(truth, "source", "full")
    bad = joined.filter(
        (F.col("packed") != F.col("total")) | (F.col("first_pack") != 0)
    )
    assert bad.count() == 0


def test_hash_split_proportions(spark):
    """The multiplicative-hash split lands near 80/10/10 on sequential keys
    (this is the property the endswith('3') trick lacks for skewed keys)."""
    split = SPECS["pp_hash_split"].fn(spark, SF_DIR_SMALL)
    by_split = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    total = sum(by_split.values())
    assert by_split.keys() == {"train", "dev", "test"}
    assert 0.70 <= by_split["train"] / total <= 0.90
    assert 0.04 <= by_split["dev"] / total <= 0.16
    assert 0.04 <= by_split["test"] / total <= 0.16


def test_span_dedup_keeper_invariants(spark):
    """Removed ≤ total per doc; the lowest doc_id holding a span never
    counts it as removed → at least one instance of every span survives."""
    sd = SPECS["pp_span_dedup"].fn(spark, SF_DIR_SMALL)
    assert sd.filter(F.col("n_dup_removed") > F.col("n_spans")).count() == 0
    kept = sd.agg(
        F.sum(F.col("n_spans") - F.col("n_dup_removed")).alias("kept")
    ).first()["kept"]
    assert kept > 0


def test_pii_scrub_redacts_all_seeded(spark):
    """Every document was seeded with exactly one email and one phone, and
    scrubbing must remove every match (no residual PII patterns)."""
    scrub = SPECS["pp_pii_scrub"].fn(spark, SF_DIR_SMALL)
    bad = scrub.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1))
    assert bad.count() == 0


def test_repetition_fraction_bounds(spark):
    rep = SPECS["pp_repetition"].fn(spark, SF_DIR_SMALL)
    bad = rep.filter(
        (F.col("dup_word_frac") < 0)
        | (F.col("dup_word_frac") >= 1)
        | (F.col("top_bigram_frac") <= 0)
        | (F.col("top_bigram_frac") > 1)
    )
    assert bad.count() == 0


def test_decontaminate_never_flags_benchmark_docs(spark):
    dec = SPECS["pp_decontaminate"].fn(spark, SF_DIR_SMALL)
    assert dec.filter(F.col("doc_id") % pp.BENCH_EVERY == 0).count() == 0
    assert dec.filter(F.col("n_contaminated_spans") <= 0).count() == 0


def test_gopher_filter_keep_consistent_with_signals(spark):
    g = SPECS["pp_gopher_filter"].fn(spark, SF_DIR_SMALL)
    recomputed = (
        (F.col("n_words") >= 50)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("stop_frac") >= 0.02)
    )
    # keep is derived from the UNROUNDED signals; rounding to 4 decimals
    # can only disagree within epsilon of a threshold — assert none here
    assert g.filter(F.col("keep") != recomputed).count() == 0
    # the gate must actually split the corpus (not all-true/all-false)
    kept = g.filter("keep").count()
    assert 0 < kept < g.count()
