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
