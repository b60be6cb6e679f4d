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

def test_stream_quality_gate_matches_batch(spark, tmp_path):
    """The streaming gate must produce row-identical verdicts to the
    batch quality_gate (same expressions, stateless), and the windowed
    reject-reason counts must equal the batch groupBy twin."""
    from science_datalake_spark.operators.textops import quality_gate
    from science_datalake_spark.streaming.quality import (
        quality_gate_stream,
        reject_reason_counts_stream,
    )

    src = _write_doc_files(tmp_path)
    kwargs = dict(min_tokens=5, max_tokens=100, min_stopword=0.0, lang_threshold=0.0)

    gated = quality_gate_stream(_doc_stream(spark, src), **kwargs)
    run_available_now(gated, str(tmp_path / "ckpt_qg"), "qgate_test", output_mode="append")
    got = {
        r["doc_id"]: (r["keep"], r["reject_reason"], r["n_tokens"])
        for r in spark.sql("SELECT * FROM qgate_test").collect()
    }

    batch = spark.read.schema(DOC_SCHEMA).json(src)
    cols = quality_gate(F.col("text"), **kwargs)
    want = {
        r["doc_id"]: (r["keep"], r["reject_reason"], r["n_tokens"])
        for r in batch.select(
            "doc_id", cols["keep"].alias("keep"),
            cols["reject_reason"].alias("reject_reason"),
            cols["n_tokens"].alias("n_tokens"),
        ).collect()
    }
    assert got == want and len(got) == 60

    counts = reject_reason_counts_stream(
        _doc_stream(spark, src), window="1 hour", **kwargs
    )
    # complete mode: an availableNow drain's watermark never passes the
    # final window, so append would emit nothing for in-flight windows
    run_available_now(counts, str(tmp_path / "ckpt_qc"), "qcounts_test")
    got_c = {
        (r["reason"]): r["n_docs"]
        for r in spark.sql("SELECT * FROM qcounts_test").collect()
    }
    want_c = {
        r["reason"]: r["n"]
        for r in batch.select(
            F.coalesce(cols["reject_reason"], F.lit("kept")).alias("reason")
        )
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got_c == want_c
