"""Keyed upsert sink: whole-table merge-and-swap, incoming-key
validation, and partition-scoped rewrite that leaves untouched
partitions byte-identical."""

from __future__ import annotations

import pytest



def test_upsert_whole_table(spark, tmp_path):
    from science_datalake_spark.sources.sinks import upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k LONG, v STRING"
    )
    assert upsert_parquet(spark, base, path, ["k"]) == 3
    batch = spark.createDataFrame([(2, "B"), (4, "d")], "k LONG, v STRING")
    assert upsert_parquet(spark, batch, path, ["k"]) == 4
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_upsert_rejects_duplicate_incoming_keys(spark, tmp_path):
    from science_datalake_spark.sources.sinks import upsert_parquet

    path = str(tmp_path / "tbl")
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "k LONG, v STRING")
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_parquet(spark, dup, path, ["k"])


def test_upsert_partition_scoped_rewrites_only_touched(spark, tmp_path):
    import os

    from science_datalake_spark.sources.sinks import upsert_parquet

    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c"), (4, 30, "d")],
        "k LONG, day INT, v STRING",
    )
    upsert_parquet(spark, base, path, ["k"], partition_col="day")

    untouched = os.path.join(path, "day=20")
    before = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }

    batch = spark.createDataFrame(
        [(2, 10, "B"), (5, 10, "e"), (6, 40, "f")], "k LONG, day INT, v STRING"
    )
    upsert_parquet(spark, batch, path, ["k"], partition_col="day")

    got = {
        (r["k"], r["day"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, 10, "a"),
        (2, 10, "B"),
        (3, 20, "c"),
        (4, 30, "d"),
        (5, 10, "e"),
        (6, 40, "f"),
    }
    after = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }
    assert after == before, "untouched partition was rewritten"
    # no tmp/backup litter
    parent = str(tmp_path)
    assert not [
        d for d in os.listdir(parent) if "__upsertpart-" in d or "__old-" in d
    ]
