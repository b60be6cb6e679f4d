"""Catalog namespaces: persistent views in a database (the reference's
schema-namespace model) + temp-view bootstrap."""

from __future__ import annotations

import pyspark.sql.functions as F

from science_datalake_spark.catalog import register_views


def test_temp_views_and_convenience(spark, sf_oracle):
    out = register_views(spark, sf_oracle)
    assert "lineitem" in out and "documents" in out
    assert spark.sql("SELECT count(*) FROM recent_orders").first()[0] > 0
    assert spark.sql("SELECT count(*) FROM documents_en").first()[0] == 218


def _write_events(tmp_path, name, ts_type, ts_values):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array(list(range(1, len(ts_values) + 1)), pa.int64()),
            "ts": pa.array(ts_values, ts_type),
            "user_id": pa.array([7] * len(ts_values), pa.int64()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
    return str(d)


def test_events_ts_micros_ntz_normalized(spark, sf_oracle):
    # The driver testdata ships ts as timestamp[us] without UTC adjustment
    # (read as TIMESTAMP_NTZ). table() must hand back TIMESTAMP so
    # unix_micros-shaped expressions (sessionize, as-of) resolve.
    from science_datalake_spark.catalog import _events_ts_kind, table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    import os

    assert _events_ts_kind(os.path.join(sf_oracle, "events.parquet")) == "ntz"
    df = table(spark, sf_oracle, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.select(F.unix_micros("ts")).first()[0] is not None
    # the micros shape must NOT flip the session-wide nanos legacy conf
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    )


def test_events_ts_nanos_normalized(spark, tmp_path):
    import pyarrow as pa

    from science_datalake_spark.catalog import _events_ts_kind, table

    d = _write_events(
        tmp_path,
        "nanos_sf",
        pa.timestamp("ns"),
        [1_700_000_000_000_000_000, 1_700_000_001_500_000_000],
    )
    assert _events_ts_kind(d + "/events.parquet") == "nanos"
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    assert got == [1_700_000_000_000_000, 1_700_000_001_500_000]
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_events_ts_tz_passthrough(spark, tmp_path):
    import pyarrow as pa

    from science_datalake_spark.catalog import _events_ts_kind, table

    d = _write_events(
        tmp_path,
        "tz_sf",
        pa.timestamp("us", tz="UTC"),
        [1_700_000_000_000_000, 1_700_000_001_500_000],
    )
    assert _events_ts_kind(d + "/events.parquet") == "tz"
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    assert got == [1_700_000_000_000_000, 1_700_000_001_500_000]


def test_nanos_conf_scoped_to_events(spark, sf_oracle, tmp_path):
    # Reading micros-shaped events must leave a non-events nanos read in
    # the same session at vanilla behavior (it raises, not bigint).
    import pyarrow as pa
    import pytest

    from science_datalake_spark.catalog import table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    table(spark, sf_oracle, "events").limit(1).collect()
    d = _write_events(tmp_path, "other_sf", pa.timestamp("ns"), [1, 2])
    with pytest.raises(Exception):
        spark.read.parquet(d + "/events.parquet").collect()


def test_database_namespace_views(spark, sf_oracle):
    spark.sql("DROP DATABASE IF EXISTS lake_sf001 CASCADE")
    register_views(spark, sf_oracle, database="lake_sf001")
    n = spark.sql("SELECT count(*) AS n FROM lake_sf001.orders").first()["n"]
    assert n == 15000
    # namespaced join across two schema-qualified views
    joined = spark.sql(
        """
        SELECT r.r_name, count(*) AS n
        FROM lake_sf001.nation n JOIN lake_sf001.region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )
    assert joined.count() == 5
    # the view is lazy — it must reflect the file, not a copy
    dbs = [d.name for d in spark.catalog.listDatabases()]
    assert "lake_sf001" in dbs
    spark.sql("DROP DATABASE IF EXISTS lake_sf001 CASCADE")


def test_events_ts_kind_probes_partitioned_layout(spark, tmp_path):
    """A partitioned events directory (part files nested under key=value
    subdirs) must still classify from the first footer found."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from science_datalake_spark.catalog import _events_ts_kind

    d = tmp_path / "events.parquet" / "day=2024-01-01"
    d.mkdir(parents=True)
    tbl = pa.table({"ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))})
    pq.write_table(tbl, str(d / "part-0.parquet"), version="2.6")
    assert _events_ts_kind(str(tmp_path / "events.parquet")) == "nanos"
    assert _events_ts_kind(str(tmp_path)) == "nanos"  # walks one level up too


def test_events_ts_kind_unreachable_remote_uri_is_unknown():
    """A remote URI whose filesystem pyarrow can't reach must classify as
    'unknown' (table() then takes the defensive nanosAsLong read path),
    not 'absent' (which would skip nanos handling and fail the read)."""
    from science_datalake_spark.catalog import _events_ts_kind

    assert _events_ts_kind("hdfs://namenode:9000/lake/events.parquet") == "unknown"


def test_bootstrap_session_closes_fresh_session_nanos_caveat(spark, tmp_path):
    """A FRESH session querying a persistent DB view over nanos-shaped
    events bypasses table(); bootstrap_session must make that read work
    by probing the footer and setting nanosAsLong up front."""
    import pyarrow as pa

    from science_datalake_spark.catalog import bootstrap_session, register_views

    d = _write_events(
        tmp_path,
        "nanos_db_sf",
        pa.timestamp("ns"),
        [1_700_000_000_000_000_000, 1_700_000_001_500_000_000],
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    register_views(spark, d, tables=("events",), database="lake_nanos")
    try:
        # newSession shares the metastore catalog but has a FRESH SQLConf —
        # exactly the fresh-session shape the caveat described
        fresh = spark.newSession()
        assert (
            fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
        )
        bootstrap_session(fresh, d)
        got = [
            r[0]
            for r in fresh.sql(
                "SELECT unix_micros(ts) FROM lake_nanos.events ORDER BY event_id"
            ).collect()
        ]
        assert got == [1_700_000_000_000_000, 1_700_000_001_500_000]
    finally:
        spark.sql("DROP DATABASE IF EXISTS lake_nanos CASCADE")
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_plain_int64_ts_stays_bigint(spark, tmp_path):
    """An events file whose ts is a PLAIN int64 (no timestamp logical
    type) classifies 'absent' and must pass through untouched — the
    nanos DIV-1000 normalization on it would misscale epoch-micros."""
    import pyarrow as pa

    from science_datalake_spark.catalog import _events_ts_kind, table

    d = _write_events(tmp_path, "int64_sf", pa.int64(), [1_700_000_000_000_000, 1_700_000_001_500_000])
    assert _events_ts_kind(d + "/events.parquet") == "absent"
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    assert [r[0] for r in df.select("ts").orderBy("event_id").collect()] == [
        1_700_000_000_000_000,
        1_700_000_001_500_000,
    ]


def test_unknown_ts_kind_int64_raises_unless_declared(spark, tmp_path, monkeypatch):
    """'unknown' (unprobeable footer) + int64 ts is AMBIGUOUS — nanos vs
    plain epoch-micros differ 1000x — so table() must refuse to guess:
    descriptive error naming the declaration env var; with the shape
    declared, each declaration behaves like its footer-proved twin."""
    import pyarrow as pa
    import pytest

    import science_datalake_spark.catalog as cat

    nanos_dir = _write_events(
        tmp_path, "unk_nanos_sf", pa.timestamp("ns"), [1_700_000_000_000_000_000]
    )
    monkeypatch.setattr(cat, "_events_ts_kind", lambda path: "unknown")
    cat._TABLE_CACHE.clear()
    with pytest.raises(ValueError, match=cat.EVENTS_TS_KIND_ENV):
        cat.table(spark, nanos_dir, "events")

    monkeypatch.setenv(cat.EVENTS_TS_KIND_ENV, "nanos")
    cat._TABLE_CACHE.clear()
    df = cat.table(spark, nanos_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.select(F.unix_micros("ts")).first()[0] == 1_700_000_000_000_000

    # a plain-int64 micros file under declared 'absent' stays bigint
    plain_dir = _write_events(
        tmp_path, "unk_plain_sf", pa.int64(), [1_700_000_000_000_000]
    )
    monkeypatch.setenv(cat.EVENTS_TS_KIND_ENV, "absent")
    cat._TABLE_CACHE.clear()
    df2 = cat.table(spark, plain_dir, "events")
    assert dict(df2.dtypes)["ts"] == "bigint"
    assert df2.select("ts").first()[0] == 1_700_000_000_000_000

    # a typo'd declaration fails loud, naming the bad value
    monkeypatch.setenv(cat.EVENTS_TS_KIND_ENV, "nano")
    cat._TABLE_CACHE.clear()
    with pytest.raises(ValueError, match="not a recognized"):
        cat.table(spark, nanos_dir, "events")

    cat._TABLE_CACHE.clear()
    # don't leak the nanos conf into later tests (sibling-test discipline)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
