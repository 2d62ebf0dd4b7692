"""Landing-zone re-chunk: content-preserving, file-count honoring."""

from __future__ import annotations

import glob

from wikid_spark.sources.rechunk import rechunk_text


def test_rechunk_preserves_lines_and_splits(spark, tmp_path):
    src = tmp_path / "dump.txt"
    lines = [f"line-{i}" for i in range(1000)]
    src.write_text("\n".join(lines))
    out = str(tmp_path / "chunked")
    rechunk_text(spark, str(src), out, n_files=4)
    parts = glob.glob(out + "/part-*")
    assert len(parts) == 4
    back = sorted(r["value"] for r in spark.read.text(out).collect())
    assert back == sorted(lines)


def test_jsonl_shard_export(spark, tmp_path):
    """Export sink: shard count, per-shard record bound, and lossless
    round-trip of the chunking output (the realistic payload)."""
    import glob
    import json

    from wikid_spark.registry import all_queries
    from wikid_spark.sources.export import write_jsonl_shards

    chunks = all_queries()["pp_chunking"].fn(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(chunks, out, shards=3, shard_key="doc_id")
    files = sorted(glob.glob(out + "/part-*.json"))
    assert len(files) == 3
    # lossless round trip
    back = spark.read.json(out)
    assert back.count() == chunks.count()
    # shard co-location: every doc_id's chunks live in exactly one file
    seen: dict[int, str] = {}
    for f in files:
        with open(f) as fh:
            for line in fh:
                doc = json.loads(line)["doc_id"]
                assert seen.setdefault(doc, f) == f
    # record bound splits oversized shards into more files
    write_jsonl_shards(chunks, out + "2", shards=1, max_records_per_file=50)
    files2 = glob.glob(out + "2" + "/part-*.json")
    assert len(files2) > 1
