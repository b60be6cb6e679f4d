"""Driver-facing query exercising the config-driven extraction battery
(sources/extraction.py — the reference's convert_openalex.py:155-577
declarative-entity-config shape) end-to-end with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from science_datalake_spark.catalog import table
from science_datalake_spark.queries import query
from science_datalake_spark.sources.extraction import (
    ColumnSpec,
    EntitySpec,
    extract_entity,
)


@query(
    "extract_doc_tokens",
    aux=True,  # rotated to aux round 7 wave 3 (r01-r06 driver rows green; local parity continues)
    oracle=r"""
    WITH w AS (
        SELECT doc_id, source,
               list_slice(regexp_split_to_array(trim(text), '\s+'), 1, 4) AS toks
        FROM documents WHERE doc_id < 50
    ),
    t AS (SELECT doc_id, source, unnest(toks) AS tok FROM w)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           source,
           tok,
           CAST(length(tok) AS INTEGER) AS tok_len
    FROM t
    WHERE length(tok) >= 2
    ORDER BY doc_id, tok, tok_len
    """,
)
def extract_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative entity extraction through the battery machinery: build a
    nested works-like shape (array column per document), then one
    EntitySpec does the LATERAL-UNNEST + predicate + TRY_CAST projection —
    the exact sub-table pattern the reference's WORKS_SUBTABLE_SQLS uses
    for 12 works sub-tables (convert_openalex.py:459-577), as a map-only
    Spark plan (no shuffle; see tests/test_extraction.py)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    nested = d.select(
        "doc_id",
        "source",
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 4).alias("toks"),
    )
    spec = EntitySpec(
        name="doc_tokens",
        explode="toks",
        alias="tok",
        where="length(tok) >= 2",
        columns=(
            ColumnSpec("doc_id", "doc_id", "bigint"),
            ColumnSpec("source", "source"),
            ColumnSpec("tok", "tok"),
            ColumnSpec("tok_len", "length(tok)", "int"),
        ),
    )
    return extract_entity(nested, spec).orderBy("doc_id", "tok", "tok_len")
