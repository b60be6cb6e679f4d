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


def test_incremental_neardup_sink_stream_matches_batch(spark, tmp_path):
    """foreachBatch incremental near-dup: a 2-micro-batch drain must end
    with the same accepted set and index contents as running the batch
    operator sequentially on the same two batches."""
    import os
    import shutil

    from science_datalake_spark.operators.dedup_index import (
        incremental_dedup_minhash,
    )
    from science_datalake_spark.streaming.dedup import incremental_neardup_sink

    lorem = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    )
    b1 = [
        (1, "s", lorem, "2024-01-01T00:00:00.000Z"),
        (2, "s", "unique words about catalyst plans shuffles exchanges and broadcast strategies overall", "2024-01-01T00:01:00.000Z"),
    ]
    b2 = [
        (10, "s", lorem, "2024-01-01T00:02:00.000Z"),  # near-dup of 1
        (11, "s", "totally fresh second batch content with watermark sessionization and stateful operators", "2024-01-01T00:03:00.000Z"),
        (12, "s", "totally fresh second batch content with watermark sessionization and stateful operators", "2024-01-01T00:04:00.000Z"),  # dup of 11
    ]
    src = tmp_path / "nd_src"
    src.mkdir()
    import json as _json
    import time

    for name, rows in (("a.json", b1), ("b.json", b2)):
        with open(src / name, "w") as f:
            for did, s, t, ts in rows:
                f.write(
                    _json.dumps(
                        {"doc_id": did, "source": s, "text": t, "ingest_ts": ts}
                    )
                    + "\n"
                )
        time.sleep(0.05)  # distinct mtimes -> deterministic batch order

    stream = _doc_stream(spark, str(src))
    sink = incremental_neardup_sink(
        str(tmp_path / "nd_index"),
        str(tmp_path / "nd_accepted"),
        pairs_path=str(tmp_path / "nd_pairs"),
    )
    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "nd_ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got_accepted = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "nd_accepted")).collect()
    }
    got_indexed = {
        r["id"]
        for r in spark.read.parquet(str(tmp_path / "nd_index"))
        .select("id")
        .distinct()
        .collect()
    }
    got_pairs = {
        (r["id_dropped"], r["id_kept"])
        for r in spark.read.parquet(str(tmp_path / "nd_pairs")).collect()
    }

    # batch-sequential twin on the same two batches
    ref_idx = str(tmp_path / "ref_index")
    shutil.rmtree(ref_idx, ignore_errors=True)
    want_accepted, want_pairs = set(), set()
    for name in ("a.json", "b.json"):
        bdf = spark.read.schema(DOC_SCHEMA).json(str(src / name))
        acc, pairs = incremental_dedup_minhash(
            spark, bdf, "doc_id", "text", ref_idx
        )
        want_accepted |= {r["doc_id"] for r in acc.collect()}
        want_pairs |= {
            (r["id_dropped"], r["id_kept"]) for r in pairs.collect()
        }
        pairs.unpersist()
    want_indexed = {
        r["id"]
        for r in spark.read.parquet(ref_idx).select("id").distinct().collect()
    }

    assert got_accepted == want_accepted == {1, 2, 11}
    assert got_indexed == want_indexed == {1, 2, 11}
    assert got_pairs == want_pairs == {(10, 1), (12, 11)}


def test_incremental_neardup_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch gives at-least-once delivery: re-invoking the sink
    with the same batch_id — both a full replay (marker present) and a
    mid-batch replay (marker missing, index already appended) — must
    leave the accepted table unchanged."""
    import shutil

    from science_datalake_spark.streaming.dedup import incremental_neardup_sink

    idx = str(tmp_path / "r_index")
    acc = str(tmp_path / "r_accepted")
    prs = str(tmp_path / "r_pairs")
    bdf = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
            (3, "entirely different third document about streaming replay idempotence"),
        ],
        "doc_id LONG, text STRING",
    )
    sink = incremental_neardup_sink(idx, acc, pairs_path=prs)
    sink(bdf, 0)
    want = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    assert want == [1, 3]

    # full replay: the commit marker short-circuits
    sink(bdf, 0)
    assert sorted(r["doc_id"] for r in spark.read.parquet(acc).collect()) == want

    # mid-batch replay: marker lost, batch bands already in the index —
    # the overwrite-per-batch layout plus the self-pair guard converge
    shutil.rmtree(f"{acc}/_batches")
    sink(bdf, 0)
    assert sorted(r["doc_id"] for r in spark.read.parquet(acc).collect()) == want
    pairs = {
        (r["id_dropped"], r["id_kept"])
        for r in spark.read.parquet(prs).collect()
    }
    assert (1, 1) not in pairs and (3, 3) not in pairs
