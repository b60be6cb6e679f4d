"""Driver query for the flagship unification materialization.

``build_unified_papers`` (unify.py) is the engine's re-expression of the
reference's defining job (materialize_unified_papers.py: per-source DOI
normalization → top-1-per-DOI window dedup → distinct spine → 6-way
left-join fan-in → coverage flags). The testdata has no paper tables, so
the three source shapes are synthesized DETERMINISTICALLY from the TPC-H
tables over a shared DOI key domain (overlapping moduli → every coverage
combination occurs, duplicate keys → the dedup windows do real work, a
NULL/short-DOI band → the junk filter does real work), and the DuckDB
oracle replays the identical pipeline relationally: synth → regex clean →
validity filter → row_number dedup → spine → joins → 2^5 coverage UpSet.

Dialect notes (memory'd gotchas): DOUBLE→BIGINT casts round in DuckDB but
truncate in Spark, so citation counts go through an explicit floor() on
both sides; every window order carries a unique id tiebreak.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from science_datalake_spark.catalog import table
from science_datalake_spark.functions import synth_doi
from science_datalake_spark.queries import query
from science_datalake_spark.unify import build_unified_papers_grouped, coverage_upset

#: Shared DOI key domains: oa 0..599, s2 0..399, sci 100..599 — pairwise
#: overlaps and per-source exclusives, so all flag combinations appear.
_OA_MOD, _S2_MOD, _SCI_MOD, _SCI_OFF = 600, 400, 500, 100


def _synth_sql(key_expr: str) -> str:
    """DuckDB twin of functions.synth_doi(key, 'p')."""
    k = key_expr
    return f"""CASE ({k}) % 4
        WHEN 0 THEN '10.' || CAST(1000 + ({k}) AS VARCHAR) || '/j.p'
        WHEN 1 THEN 'https://doi.org/10.' || CAST(1000 + ({k}) AS VARCHAR) || '/xp'
        WHEN 2 THEN 'HTTPS://DOI.ORG/10.' || CAST(1000 + ({k}) AS VARCHAR) || '/Yp'
        ELSE 'doi.org/10.' || CAST(1000 + ({k}) AS VARCHAR) || '/z'
    END"""


_CLEAN = (
    "lower(coalesce(nullif(regexp_extract(lower({d}), 'doi\\.org/(.+)$', 1), ''), {d}))"
)
_VALID = "{d} IS NOT NULL AND {d} != '' AND length({d}) >= 5"


def _unify_oracle() -> str:
    return f"""
    WITH oa_raw AS (
        SELECT 'W' || CAST(o_orderkey AS VARCHAR) AS openalex_id,
               CASE WHEN o_orderkey % 31 = 0 THEN NULL
                    ELSE {_synth_sql(f"o_orderkey % {_OA_MOD}")} END AS raw_doi,
               CAST(floor(o_totalprice) AS BIGINT) AS oa_cited_by_count,
               (o_orderstatus = 'F') AS oa_is_retracted
        FROM orders
    ),
    oa_keyed AS (
        SELECT *, {_CLEAN.format(d='raw_doi')} AS doi FROM oa_raw
    ),
    oa AS (
        SELECT doi, openalex_id, oa_cited_by_count, oa_is_retracted FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doi
                ORDER BY oa_cited_by_count DESC NULLS LAST, openalex_id
            ) AS rn
            FROM oa_keyed WHERE {_VALID.format(d='doi')}
        ) WHERE rn = 1
    ),
    s2_raw AS (
        SELECT c_custkey AS corpusid,
               CASE WHEN c_custkey % 41 = 0 THEN 'x'
                    ELSE {_synth_sql(f"c_custkey % {_S2_MOD}")} END AS raw_doi,
               CAST(floor(c_acctbal) AS BIGINT) AS s2_citationcount
        FROM customer
    ),
    s2_keyed AS (
        SELECT *, {_CLEAN.format(d='raw_doi')} AS doi FROM s2_raw
    ),
    s2 AS (
        SELECT doi, corpusid, s2_citationcount FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doi
                ORDER BY s2_citationcount DESC NULLS LAST, corpusid
            ) AS rn
            FROM s2_keyed WHERE {_VALID.format(d='doi')}
        ) WHERE rn = 1
    ),
    sci_raw AS (
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS sci_paperid,
               {_synth_sql(f"p_partkey % {_SCI_MOD} + {_SCI_OFF}")} AS raw_doi,
               CAST(p_size AS BIGINT) AS sci_citation_count
        FROM part
    ),
    sci_keyed AS (
        SELECT *, {_CLEAN.format(d='raw_doi')} AS doi FROM sci_raw
    ),
    sci AS (
        SELECT doi, sci_paperid, sci_citation_count FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doi
                ORDER BY sci_citation_count DESC NULLS LAST, sci_paperid
            ) AS rn
            FROM sci_keyed WHERE {_VALID.format(d='doi')}
        ) WHERE rn = 1
    ),
    rw AS (
        SELECT DISTINCT {_CLEAN.format(d='raw_doi')} AS doi FROM (
            SELECT {_synth_sql('n_nationkey * 20')} AS raw_doi FROM nation
        )
    ),
    pwc AS (
        SELECT DISTINCT {_CLEAN.format(d='raw_doi')} AS doi FROM (
            SELECT {_synth_sql(f"(s_suppkey * 7) % {_OA_MOD}")} AS raw_doi
            FROM supplier
        )
    ),
    spine AS (
        SELECT doi FROM oa UNION SELECT doi FROM s2 UNION SELECT doi FROM sci
    ),
    unified AS (
        SELECT sp.doi,
               oa.openalex_id IS NOT NULL   AS has_openalex,
               s2.corpusid IS NOT NULL      AS has_s2ag,
               sci.sci_paperid IS NOT NULL  AS has_sciscinet,
               pwc.doi IS NOT NULL          AS has_pwc,
               rw.doi IS NOT NULL           AS has_retraction
        FROM spine sp
        LEFT JOIN oa  ON oa.doi  = sp.doi
        LEFT JOIN s2  ON s2.doi  = sp.doi
        LEFT JOIN sci ON sci.doi = sp.doi
        LEFT JOIN pwc ON pwc.doi = sp.doi
        LEFT JOIN rw  ON rw.doi  = sp.doi
    )
    SELECT has_openalex, has_s2ag, has_sciscinet, has_pwc, has_retraction,
           count(*) AS n
    FROM unified
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY 1, 2, 3, 4, 5
    """


@query("unify_coverage", oracle=_unify_oracle())
def unify_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-flag UpSet of the flagship 6-way unification over synthetic
    source shapes derived from the testdata spine (see module docstring).
    Exercises the full materialization path end-to-end: clean_doi on three
    wild formats, the junk-DOI filter, per-source top-1 windows, the
    distinct spine, broadcast existence dims, and the 2^5 rollup
    (materialize_unified_papers.py:502-509)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    oa = o.select(
        F.concat(F.lit("W"), F.col("o_orderkey").cast("string")).alias("id"),
        F.when(F.col("o_orderkey") % 31 == 0, F.lit(None).cast("string"))
        .otherwise(synth_doi(F.col("o_orderkey") % _OA_MOD, F.lit("p")))
        .alias("doi"),
        F.col("o_orderpriority").alias("title"),
        F.year("o_orderdate").alias("publication_year"),
        F.floor("o_totalprice").cast("long").alias("cited_by_count"),
        (F.col("o_orderstatus") == "F").alias("is_retracted"),
    )
    s2 = c.select(
        F.col("c_custkey").alias("corpusid"),
        F.struct(
            F.when(F.col("c_custkey") % 41 == 0, F.lit("x"))
            .otherwise(synth_doi(F.col("c_custkey") % _S2_MOD, F.lit("p")))
            .alias("DOI")
        ).alias("externalids"),
        F.col("c_name").alias("title"),
        (F.lit(1990) + F.col("c_custkey") % 30).alias("year"),
        F.floor("c_acctbal").cast("long").alias("citationcount"),
    )
    sci = p.select(
        F.concat(F.lit("P"), F.col("p_partkey").cast("string")).alias("paperid"),
        synth_doi(F.col("p_partkey") % _SCI_MOD + _SCI_OFF, F.lit("p")).alias("doi"),
        F.col("p_size").cast("long").alias("citation_count"),
        F.col("p_retailprice").cast("string").alias("disruption"),
    )
    rw = n.select(
        synth_doi(F.col("n_nationkey") * 20, F.lit("p")).alias("original_paper_doi")
    )
    pwc = s.select(
        synth_doi((F.col("s_suppkey") * 7) % _OA_MOD, F.lit("p")).alias("doi")
    )

    # the one-shuffle grouped strategy (equality-tested against the
    # windowed build in tests/test_unify.py): fewer stages, same rows
    unified = build_unified_papers_grouped(oa, s2, sci, retractions=rw, code_links=pwc)
    return coverage_upset(unified)
