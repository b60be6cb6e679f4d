"""Streaming dedup: dropDuplicatesWithinWatermark over a document file
stream must keep exactly one row per distinct content fingerprint —
matching the batch exact-dedup twin."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from science_datalake_spark.streaming.dedup import dedup_counts_stream, dedup_stream
from science_datalake_spark.streaming.events import run_available_now

DOC_SCHEMA = "doc_id LONG, source STRING, text STRING, ingest_ts TIMESTAMP"


def _write_doc_files(tmp_path, n_files=3, per_file=20):
    """60 docs, every 4th a duplicate text of doc (i - i%4)."""
    src = tmp_path / "docs_src"
    src.mkdir()
    did = 0
    for fi in range(n_files):
        with open(src / f"docs-{fi}.json", "w") as f:
            for _ in range(per_file):
                base = did - (did % 4)
                f.write(
                    json.dumps(
                        {
                            "doc_id": did,
                            "source": f"src{did % 3}",
                            "text": f"document body number {base} " * 10,
                            "ingest_ts": f"2024-01-01T00:{did:02d}:00.000Z",
                        }
                    )
                    + "\n"
                )
                did += 1
    return str(src)


def _doc_stream(spark, src):
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


def test_stream_dedup_matches_batch(spark, tmp_path):
    src = _write_doc_files(tmp_path)
    deduped = dedup_stream(_doc_stream(spark, src), watermark="10 minutes")
    run_available_now(deduped, str(tmp_path / "ckpt_dd"), "dedup_test", output_mode="append")
    got = spark.sql("SELECT * FROM dedup_test").cache()

    batch = spark.read.schema(DOC_SCHEMA).json(src)
    n_distinct = batch.select("text").distinct().count()
    assert got.count() == n_distinct == 15  # 60 docs / 4-dup groups
    # exactly one survivor per content group, and it is a real input row
    assert got.select("text").distinct().count() == n_distinct
    assert got.join(batch, ["doc_id", "text"]).count() == got.count()


def test_stream_dedup_counts(spark, tmp_path):
    src = _write_doc_files(tmp_path)
    counts = dedup_counts_stream(_doc_stream(spark, src), watermark="10 minutes")
    run_available_now(counts, str(tmp_path / "ckpt_dc"), "dedup_counts_test")
    got = {r["source"]: r for r in spark.sql("SELECT * FROM dedup_counts_test").collect()}
    assert set(got) == {"src0", "src1", "src2"}
    assert sum(r["n_docs"] for r in got.values()) == 60
    for r in got.values():
        assert 0 < r["n_distinct_approx"] <= r["n_docs"]