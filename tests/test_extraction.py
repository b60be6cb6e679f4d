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


OA_WORK = {
    "id": "W100",
    "doi": "10.5/x",
    "title": "Full Work",
    "display_name": "Full Work",
    "publication_year": 2021,
    "publication_date": "2021-06-01",
    "language": "en",
    "type": "article",
    "cited_by_count": 12,
    "fwci": 1.5,
    "is_retracted": False,
    "is_paratext": False,
    "has_fulltext": True,
    "abstract": "An abstract.",
    "referenced_works_count": 2,
    "updated_date": "2026-01-01",
    "created_date": "2021-06-02",
    "authorships": [
        {
            "author": {"id": "A9", "display_name": "Noor", "orcid": "0000-1"},
            "raw_author_name": "N. Example",
            "is_corresponding": True,
            "raw_affiliation_strings": ["Inst One"],
            "institutions": [{"id": "I1"}],
            "countries": ["DE"],
        }
    ],
    "topics": [{"id": "T5", "display_name": "Topic Five", "score": 0.77}],
    "referenced_works": ["W1", "W2"],
    "related_works": ["W3"],
    "locations": [
        {
            "source": {"id": "S1", "display_name": "Journal One"},
            "pdf_url": "http://x/pdf",
            "landing_page_url": "http://x",
            "is_oa": True,
            "license": "cc-by",
            "version": "publishedVersion",
        }
    ],
    "ids": {"openalex": "W100", "doi": "https://doi.org/10.5/x", "pmid": "123", "mag": "9"},
    "open_access": {
        "is_oa": True,
        "oa_status": "gold",
        "oa_url": "http://x",
        "any_repository_has_fulltext": True,
    },
    "biblio": {"volume": "7", "issue": "2", "first_page": "10", "last_page": "20"},
    "counts_by_year": [{"year": 2021, "cited_by_count": 4}, {"year": 2022, "cited_by_count": 8}],
    "best_oa_location": {
        "source": {"id": "S1"},
        "pdf_url": "http://x/pdf",
        "landing_page_url": "http://x",
        "is_oa": True,
        "license": "cc-by",
        "version": "publishedVersion",
    },
    "concepts": [{"id": "C1", "display_name": "Concept", "level": 2, "score": 0.4}],
    "keywords": [{"id": "K1", "display_name": "keyword", "score": 0.3}],
}


def test_openalex_works_battery_full_12_subtables(spark, tmp_path):
    """The reference's works main + 12 sub-tables (WORKS_SUBTABLE_SQLS,
    convert_openalex.py:435-577) from ONE declarative config."""
    from science_datalake_spark.sources.openalex_battery import (
        WORKS_ENSURE_DDL,
        works_battery,
    )

    p = str(tmp_path / "works_full.ndjson.gz")
    _write_ndjson(p, [OA_WORK, {"id": "W101", "title": "Bare"}])
    src = read_ndjson(spark, p)
    out = extract_battery(src, works_battery(), ensure=WORKS_ENSURE_DDL)
    assert len(out) == 13

    main = {r["id"]: r for r in out["works"].collect()}
    assert main["W100"]["fwci"] == 1.5 and main["W101"]["fwci"] is None

    expected_rows = {
        "works_authorships": 1,
        "works_topics": 1,
        "works_referenced_works": 2,
        "works_related_works": 1,
        "works_locations": 1,
        "works_counts_by_year": 2,
        "works_concepts": 1,
        "works_keywords": 1,
    }
    for name, n in expected_rows.items():
        assert out[name].count() == n, name

    ids = out["works_ids"].collect()
    # struct-filter sub-tables: W101's padded NULL struct drops out
    assert len(ids) == 1 and ids[0]["doi"] == "https://doi.org/10.5/x"
    oa = out["works_open_access"].collect()
    assert len(oa) == 1 and oa[0]["oa_status"] == "gold"
    bib = out["works_biblio"].collect()
    assert len(bib) == 1 and bib[0]["volume"] == "7"
    best = out["works_best_oa_location"].collect()
    assert len(best) == 1 and best[0]["license"] == "cc-by"


def test_openalex_simple_entities_and_authors(spark, tmp_path):
    from science_datalake_spark.sources.openalex_battery import (
        SIMPLE_ENTITY_SPECS,
        authors_battery,
    )

    assert set(SIMPLE_ENTITY_SPECS) == {
        "domains", "fields", "subfields", "topics", "publishers",
        "funders", "sources", "institutions", "concepts",
    }

    p = str(tmp_path / "topics.ndjson.gz")
    _write_ndjson(
        p,
        [
            {
                "id": "T1",
                "display_name": "Deep Learning",
                "description": "nets",
                "keywords": ["cnn"],
                "subfield": {"id": "SF1", "display_name": "AI"},
                "field": {"id": "F1", "display_name": "CS"},
                "domain": {"id": "D1", "display_name": "Phys Sci"},
                "works_count": 10,
                "cited_by_count": 99,
                "ids": {"openalex": "T1", "wikipedia": "http://w"},
                "updated_date": "2026-01-01",
                "created_date": "2020-01-01",
            }
        ],
    )
    topics = extract_entity(read_ndjson(spark, p), SIMPLE_ENTITY_SPECS["topics"])
    row = topics.first()
    assert row["domain_display_name"] == "Phys Sci" and row["works_count"] == 10

    pa = str(tmp_path / "authors.ndjson.gz")
    _write_ndjson(
        pa,
        [
            {
                "id": "A1",
                "orcid": "0000-2",
                "display_name": "Ada",
                "works_count": 3,
                "cited_by_count": 30,
                "ids": {"openalex": "A1", "orcid": "https://orcid.org/0000-2"},
                "counts_by_year": [
                    {"year": 2024, "works_count": 1, "oa_works_count": 1, "cited_by_count": 5}
                ],
                "last_known_institutions": [{"id": "I1"}],
            }
        ],
    )
    out = extract_battery(read_ndjson(spark, pa), authors_battery())
    assert out["authors"].first()["orcid_url"] == "https://orcid.org/0000-2"
    assert out["authors_ids"].count() == 1
    cby = out["authors_counts_by_year"].first()
    assert cby["year"] == 2024 and cby["cited_by_count"] == 5


def test_simple_entity_auto_ensure_on_old_shard(spark, tmp_path):
    """A shard with only {id, display_name} still extracts every declared
    column as typed NULL — derive_ensure_ddl pads scalars AND struct roots
    referenced by the spec."""
    from science_datalake_spark.sources.openalex_battery import SIMPLE_ENTITY_SPECS

    p = str(tmp_path / "pub_old.ndjson.gz")
    _write_ndjson(p, [{"id": "P1", "display_name": "Pub"}])
    row = extract_entity(
        read_ndjson(spark, p), SIMPLE_ENTITY_SPECS["publishers"]
    ).first()
    assert row["id"] == "P1"
    assert row["ror_id"] is None and row["h_index"] is None
    assert row["alternate_titles"] is None


def test_extraction_prunes_parquet_scan(spark, tmp_path):
    """Each sub-table's scan must read ONLY its referenced columns
    (ReadSchema pruning): a works_topics extraction over a wide parquet
    source touches id+topics, never authorships/text-heavy columns."""
    p = str(tmp_path / "w.ndjson.gz")
    _write_ndjson(p, [OA_WORK])
    src = read_ndjson(spark, p)
    pq_path = str(tmp_path / "works_pq")
    src.write.parquet(pq_path)

    from science_datalake_spark.sources.openalex_battery import WORKS_SUBTABLE_SPECS

    df = extract_entity(spark.read.parquet(pq_path), WORKS_SUBTABLE_SPECS["works_topics"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m, plan
    schema_line = m[0]
    assert "topics" in schema_line and "id" in schema_line
    assert "authorships" not in schema_line and "abstract" not in schema_line


def test_auto_ensure_covers_explode_column(spark, tmp_path):
    """An exploded spec with NO explicit ensure still analyzes on an old
    shard missing the array column: derive_ensure_ddl pads the explode
    source as a typed-NULL array (element shape inferred from the alias
    references), so the extraction yields zero rows instead of failing."""
    from science_datalake_spark.sources.extraction import derive_ensure_ddl

    struct_spec = EntitySpec(
        name="tags",
        explode="tags",
        alias="x",
        columns=(
            ColumnSpec("id", "id"),
            ColumnSpec("tag_name", "x.name"),
            ColumnSpec("tag_score", "x.score", "double"),
        ),
    )
    ddl = derive_ensure_ddl(struct_spec)
    assert "tags ARRAY<STRUCT<name: string, score: double>>" in ddl

    scalar_spec = EntitySpec(
        name="kw",
        explode="keywords",
        alias="x",
        columns=(ColumnSpec("id", "id"), ColumnSpec("kw", "x")),
    )
    assert "keywords ARRAY<STRING>" in derive_ensure_ddl(scalar_spec)

    p = str(tmp_path / "old_shard.ndjson.gz")
    _write_ndjson(p, [{"id": "W1"}])  # no tags column at all
    out = extract_entity(read_ndjson(spark, p), struct_spec)
    assert out.columns == ["id", "tag_name", "tag_score"]
    assert out.count() == 0  # inner explode of NULL array -> no rows
