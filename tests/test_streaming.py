"""Structured Streaming tests: file-source stream → watermark → windowed
agg, drained with availableNow; result must equal the batch twin."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from science_datalake_spark.streaming.events import (
    hourly_counts,
    read_event_stream,
    run_available_now,
    sliding_user_activity,
)


def _write_event_files(tmp_path, n_files=3, per_file=40):
    src = tmp_path / "stream_src"
    src.mkdir()
    eid = 0
    for fi in range(n_files):
        with open(src / f"events-{fi}.json", "w") as f:
            for i in range(per_file):
                minute = (eid * 7) % (60 * 6)  # spread over 6 hours
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": f"2024-01-01T{minute // 60:02d}:{minute % 60:02d}:00.000Z",
                            "user_id": eid % 9,
                            "event_type": ["click", "view", "error"][eid % 3],
                            "value": round(eid * 0.5, 2),
                            "props": json.dumps({"k": eid % 5}),
                        }
                    )
                    + "\n"
                )
                eid += 1
    return str(src)


def test_hourly_counts_stream_matches_batch(spark, tmp_path):
    src = _write_event_files(tmp_path)
    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    run_available_now(hourly_counts(stream), str(tmp_path / "ckpt1"), "hourly_test")
    got = spark.sql("SELECT * FROM hourly_test").cache()

    batch = (
        spark.read.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
        )
        .json(src)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0


def test_sliding_windows_stream(spark, tmp_path):
    src = _write_event_files(tmp_path)
    stream = read_event_stream(spark, src)
    run_available_now(sliding_user_activity(stream), str(tmp_path / "ckpt2"), "sliding_test")
    got = spark.sql("SELECT * FROM sliding_test")
    # each event lands in 2 overlapping 1h/30min windows → strictly more
    # window rows than the tumbling variant
    assert got.count() > 0
    assert got.select("window_start").distinct().count() >= 12


def test_stream_checkpoint_resume(spark, tmp_path):
    """New files after a drain are picked up incrementally, not reprocessed."""
    src = _write_event_files(tmp_path, n_files=1)
    ckpt = str(tmp_path / "ckpt3")
    stream = read_event_stream(spark, src)
    run_available_now(hourly_counts(stream), ckpt, "resume_test")
    n1 = spark.sql("SELECT coalesce(sum(n_events),0) AS n FROM resume_test").first()["n"]
    # append one more file, drain again from the same checkpoint
    with open(f"{src}/late.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "event_id": 999,
                    "ts": "2024-01-01T05:30:00.000Z",
                    "user_id": 1,
                    "event_type": "click",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            + "\n"
        )
    stream2 = read_event_stream(spark, src)
    run_available_now(hourly_counts(stream2), ckpt, "resume_test2")
    n2 = spark.sql("SELECT coalesce(sum(n_events),0) AS n FROM resume_test2").first()["n"]
    assert n1 == 40
    # resumed state (40) + only the new file (1); a reprocess would give 81
    assert n2 == 41
