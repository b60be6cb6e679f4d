"""End-to-end pipeline: NDJSON sources → incremental ingest → compaction →
unification → sanity — the reference's cmd_update lifecycle in one run."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from science_datalake_spark.pipeline import run_pipeline
from tests import fixtures


def _dump_ndjson(df, path, n_files=2):
    """Write a DataFrame as NDJSON files (simulating raw source dumps)."""
    rows = [json.loads(r) for r in df.toJSON().collect()]
    path.mkdir(parents=True)
    per = max(1, len(rows) // n_files + 1)
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        with open(path / f"part-{i}.jsonl", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")


def test_full_pipeline(spark, tmp_path):
    _dump_ndjson(fixtures.works_b(spark), tmp_path / "src" / "openalex")
    _dump_ndjson(fixtures.papers_a(spark), tmp_path / "src" / "s2ag")
    _dump_ndjson(fixtures.metrics_c(spark), tmp_path / "src" / "sciscinet")
    _dump_ndjson(fixtures.retractions(spark), tmp_path / "src" / "retractions")
    _dump_ndjson(fixtures.code_links(spark), tmp_path / "src" / "code_links")
    _dump_ndjson(fixtures.fulltext_src(spark), tmp_path / "src" / "fulltext")

    result = run_pipeline(
        spark,
        {
            "openalex": str(tmp_path / "src" / "openalex"),
            "s2ag": str(tmp_path / "src" / "s2ag"),
            "sciscinet": str(tmp_path / "src" / "sciscinet"),
            "retractions": str(tmp_path / "src" / "retractions"),
            "code_links": str(tmp_path / "src" / "code_links"),
            "fulltext": str(tmp_path / "src" / "fulltext"),
        },
        str(tmp_path / "lake"),
    )
    assert result.ingested_rows["openalex"] == 351
    assert result.ingested_rows["s2ag"] == 301
    # same golden count as the in-memory unify test — the NDJSON roundtrip
    # (JSON nulls, nested structs) must not change semantics
    assert result.unified_rows == 221
    assert result.fulltext_rows == 60
    for c in result.sanity:
        print(c)
    assert result.ok, [str(c) for c in result.sanity if not c.passed]

    # the view layer is queryable afterwards (the reference's query surface)
    n = spark.sql(
        "SELECT count(*) AS n FROM unified_papers WHERE has_retraction"
    ).first()["n"]
    assert n == 1

    # idempotent re-run: checkpoint skips everything, counts unchanged
    result2 = run_pipeline(
        spark,
        {
            "openalex": str(tmp_path / "src" / "openalex"),
            "s2ag": str(tmp_path / "src" / "s2ag"),
            "sciscinet": str(tmp_path / "src" / "sciscinet"),
        },
        str(tmp_path / "lake"),
    )
    assert result2.unified_rows == 221


def test_cli_update_subcommand(spark, tmp_path, capsys):
    """`science-datalake-spark update` — the reference's headline CLI
    lifecycle — wires run_pipeline end-to-end: per-source staging report,
    count-verified materialization, sanity gate driving the exit code."""
    from science_datalake_spark.cli import main

    _dump_ndjson(fixtures.works_b(spark), tmp_path / "cli_src" / "openalex")
    _dump_ndjson(fixtures.papers_a(spark), tmp_path / "cli_src" / "s2ag")
    _dump_ndjson(fixtures.metrics_c(spark), tmp_path / "cli_src" / "sciscinet")

    rc = main(
        [
            "update",
            "--work-dir", str(tmp_path / "cli_lake"),
            "--openalex", str(tmp_path / "cli_src" / "openalex"),
            "--s2ag", str(tmp_path / "cli_src" / "s2ag"),
            "--sciscinet", str(tmp_path / "cli_src" / "sciscinet"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "unified_papers: 221 rows" in out
    assert "sanity FAIL" not in out
    assert (tmp_path / "cli_lake" / "unified_papers.parquet").exists()
