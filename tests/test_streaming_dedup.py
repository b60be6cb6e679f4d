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


def test_incremental_bloom_sink_stream_matches_batch(spark, tmp_path):
    """foreachBatch exact incremental dedup behind the durable Bloom
    artifact: a 3-micro-batch drain keeps exactly the first arrival of
    each distinct content fingerprint (within AND across batches), and
    the persisted bitmap's geometry survives across batches."""
    import time

    from science_datalake_spark.operators.bloom import bloom_read
    from science_datalake_spark.streaming.dedup import incremental_bloom_sink

    src = tmp_path / "bl_src"
    src.mkdir()
    batches = [
        [(0, "aaa one"), (1, "bbb two"), (2, "aaa one")],          # 2 dup of 0
        [(10, "aaa one"), (11, "ccc three")],                       # 10 dup of 0
        [(20, "ccc three"), (21, "ddd four"), (22, "ddd four")],    # dups of 11, 21
    ]
    for fi, rows in enumerate(batches):
        with open(src / f"b{fi}.json", "w") as f:
            for did, t in rows:
                f.write(
                    json.dumps(
                        {
                            "doc_id": did,
                            "source": "s",
                            "text": t,
                            "ingest_ts": f"2024-01-01T00:0{fi}:00.000Z",
                        }
                    )
                    + "\n"
                )
        time.sleep(0.05)

    sink = incremental_bloom_sink(
        str(tmp_path / "bl_bloom"),
        str(tmp_path / "bl_accepted"),
        expected_items=10_000,
    )
    q = (
        _doc_stream(spark, str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "bl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    acc = spark.read.parquet(str(tmp_path / "bl_accepted"))
    got = {r["doc_id"] for r in acc.collect()}
    assert got == {0, 1, 11, 21}
    # fp column persisted for future verify joins; one row per distinct fp
    assert acc.select("fp").distinct().count() == 4
    model = bloom_read(spark, str(tmp_path / "bl_bloom"))
    assert model.n_items == 4 and model.num_bits % 64 == 0
    # every accepted fingerprint probes positive (zero false negatives)
    from science_datalake_spark.operators.bloom import bloom_might_contain

    probed = bloom_might_contain(acc.select("fp"), "fp", model)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_incremental_bloom_sink_replay_idempotent(spark, tmp_path):
    """At-least-once: replaying a committed micro-batch is a no-op, and
    replaying an UNcommitted one (accepted written, marker missing — the
    mid-batch crash) re-derives the same accepted set instead of
    anti-joining against its own output."""
    from science_datalake_spark.streaming.dedup import incremental_bloom_sink
    from science_datalake_spark.util import fs_exists

    sink = incremental_bloom_sink(
        str(tmp_path / "bl2_bloom"),
        str(tmp_path / "bl2_accepted"),
        expected_items=1_000,
    )
    b0 = spark.createDataFrame(
        [(0, "s", "xxx"), (1, "s", "yyy")], "doc_id LONG, source STRING, text STRING"
    )
    b1 = spark.createDataFrame(
        [(10, "s", "xxx"), (11, "s", "zzz")], "doc_id LONG, source STRING, text STRING"
    )
    sink(b0, 0)
    sink(b1, 1)
    acc_path = str(tmp_path / "bl2_accepted")
    before = sorted(
        (r["doc_id"], r["ingest_batch"]) for r in spark.read.parquet(acc_path).collect()
    )
    assert [d for d, _ in before] == [0, 1, 11]
    # committed replay: no-op
    sink(b1, 1)
    # crash replay: remove batch 1's marker, rerun — same result
    hadoop = spark._jvm.org.apache.hadoop
    p = hadoop.fs.Path(f"{acc_path}/_batches/1")
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
    assert not fs_exists(spark, f"{acc_path}/_batches/1")
    sink(b1, 1)
    after = sorted(
        (r["doc_id"], r["ingest_batch"]) for r in spark.read.parquet(acc_path).collect()
    )
    assert after == before


def test_weighted_sample_sink_stream_matches_batch(spark, tmp_path):
    """The A-ES key is a pure function of the row, so the streaming
    reservoir (artifact ∪ batch → re-cut per micro-batch) must equal the
    BATCH weighted_sample over all rows EXACTLY — same key set — no
    matter how the stream was chunked."""
    from science_datalake_spark.operators.sampling import weighted_sample
    from science_datalake_spark.streaming.sampling import weighted_sample_sink

    src = _write_doc_files(tmp_path, n_files=4, per_file=15)
    docs = spark.read.schema(DOC_SCHEMA).json(src).withColumn(
        "w", F.length("text").cast("double")
    )
    want = {
        r["doc_id"]
        for r in weighted_sample(docs, 10, "doc_id", "w", seed=9).collect()
    }

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("w", F.length("text").cast("double"))
    )
    path = str(tmp_path / "sample")
    q = (
        weighted_sample_sink(
            stream, path, str(tmp_path / "ckpt"), 10, "doc_id", "w", seed=9
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert got == want


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    """The streaming decontamination (broadcast eval shingles probed per
    micro-batch, zero state) must produce the identical per-document
    (n_shingles, n_shared, overlap, is_contaminated) as the batch
    operator on the same documents, no matter how the stream chunks."""
    from science_datalake_spark.operators.corpus import decontaminate
    from science_datalake_spark.streaming.decontamination import (
        decontaminate_stream,
        eval_shingle_broadcast,
    )

    src = _write_doc_files(tmp_path, n_files=3, per_file=20)
    batch = spark.read.schema(DOC_SCHEMA).json(src)
    # eval set = a handful of docs' text, so some streamed docs overlap
    eval_docs = batch.filter("doc_id % 4 = 0").select("text")
    bc = eval_shingle_broadcast(eval_docs, n=3)

    out = decontaminate_stream(
        _doc_stream(spark, src), bc, "doc_id", n=3, max_overlap=0.5
    ).select("doc_id", "n_shingles", "n_shared", "overlap", "is_contaminated")
    run_available_now(out, str(tmp_path / "ckpt_dc"), "decon_test", output_mode="append")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["overlap"], r["is_contaminated"])
        for r in spark.sql("SELECT * FROM decon_test").collect()
    }

    want = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["overlap"], r["is_contaminated"])
        for r in decontaminate(batch, eval_docs, "doc_id", n=3, max_overlap=0.5).collect()
    }
    assert got == want and len(got) == 60
    # the duplicated-text fixture guarantees real hits: every 4th doc's
    # base text IS in the eval set, so contamination must actually fire
    assert any(v[3] for v in got.values())
