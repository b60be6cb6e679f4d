"""Config-driven multi-entity extraction battery (the reference's
SIMPLE_ENTITY_CONFIGS / WORKS_SUBTABLE_SQLS shape, convert_openalex.py:
155-577): one nested source → many typed sub-tables from declarative
specs, with schema-evolution padding and TRY_CAST tolerance."""

from __future__ import annotations

import gzip
import json

import pyspark.sql.functions as F

from science_datalake_spark.sources.extraction import (
    WORKS_BATTERY,
    WORKS_ENSURE,
    ColumnSpec,
    EntitySpec,
    extract_battery,
    extract_entity,
)
from science_datalake_spark.sources.json_source import read_ndjson

WORKS = [
    {
        "id": "W1",
        "doi": "10.1/a",
        "title": "Alpha",
        "publication_year": 2020,
        "cited_by_count": 5,
        "is_retracted": False,
        "authorships": [
            {"author": {"id": "A1", "display_name": "Ada"}, "is_corresponding": True},
            {"author": {"id": "A2", "display_name": "Bob"}, "is_corresponding": False},
        ],
        "topics": [{"id": "T1", "score": 0.9}, {"id": "T2", "score": 0.4}],
        "referenced_works": ["W2", "W9"],
    },
    {
        "id": "W2",
        "doi": "10.1/b",
        "title": "Beta",
        "publication_year": "not-a-year",  # TRY_CAST → NULL, never an error
        "cited_by_count": 1,
        "is_retracted": True,
        "authorships": [
            {"author": {"id": "A1", "display_name": "Ada"}, "is_corresponding": None}
        ],
        "topics": [],
        "referenced_works": None,
    },
]


def _write_ndjson(path, rows):
    with gzip.open(path, "wt") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_works_battery_builds_subtables(spark, tmp_path):
    p = str(tmp_path / "works.ndjson.gz")
    _write_ndjson(p, WORKS)
    src = read_ndjson(spark, p)
    out = extract_battery(src, WORKS_BATTERY, ensure=WORKS_ENSURE)
    assert set(out) == {
        "works",
        "works_authorships",
        "works_topics",
        "works_referenced_works",
    }

    works = {r["id"]: r for r in out["works"].collect()}
    assert works["W1"]["publication_year"] == 2020
    assert works["W2"]["publication_year"] is None  # TRY_CAST tolerance
    assert works["W2"]["is_retracted"] is True

    auth = out["works_authorships"].collect()
    assert len(auth) == 3
    assert {(r["work_id"], r["author_id"]) for r in auth} == {
        ("W1", "A1"),
        ("W1", "A2"),
        ("W2", "A1"),
    }

    topics = out["works_topics"].collect()
    assert len(topics) == 2  # W2's empty topics list yields no rows
    assert all(isinstance(r["score"], float) for r in topics)

    refs = {(r["work_id"], r["referenced_work_id"]) for r in out["works_referenced_works"].collect()}
    assert refs == {("W1", "W2"), ("W1", "W9")}  # null array → no rows


def test_battery_pads_missing_columns_on_old_shards(spark, tmp_path):
    """An old shard lacking half the referenced columns must still extract
    (typed NULLs / empty sub-tables), the ensure_source_columns contract."""
    p = str(tmp_path / "old.ndjson.gz")
    _write_ndjson(p, [{"id": "W7", "title": "Old"}])
    src = read_ndjson(spark, p)
    out = extract_battery(src, WORKS_BATTERY, ensure=WORKS_ENSURE)
    row = out["works"].first()
    assert row["id"] == "W7" and row["doi"] is None and row["cited_by_count"] is None
    assert out["works_authorships"].count() == 0
    assert out["works_referenced_works"].count() == 0


def test_entity_spec_where_and_outer_explode(spark):
    src = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", []), ("c", None)],
        "id STRING, xs ARRAY<INT>",
    )
    inner = extract_entity(
        src,
        EntitySpec(
            name="t",
            explode="xs",
            alias="x",
            where="x >= 2",
            columns=(ColumnSpec("id", "id"), ColumnSpec("x", "x", "int")),
        ),
    )
    assert {(r["id"], r["x"]) for r in inner.collect()} == {("a", 2), ("a", 3)}

    outer = extract_entity(
        src,
        EntitySpec(
            name="t",
            explode="xs",
            alias="x",
            explode_outer=True,
            columns=(ColumnSpec("id", "id"), ColumnSpec("x", "x", "int")),
        ),
    )
    got = {(r["id"], r["x"]) for r in outer.collect()}
    assert ("b", None) in got and ("c", None) in got


def test_extraction_is_map_only(spark):
    """The battery must not shuffle: an extraction plan contains no
    Exchange — explode + project stay inside one map stage."""
    src = spark.createDataFrame(
        [("a", [{"id": "T1", "score": 0.5}])],
        "id STRING, topics ARRAY<STRUCT<id: STRING, score: DOUBLE>>",
    )
    df = extract_entity(src, WORKS_BATTERY["works_topics"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
