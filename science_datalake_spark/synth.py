"""Deterministic skewed synthetic sources for scale-proofing the unify
pipeline (round-1 verdict #6: "run build_unified_papers + sanity at sf0.1
with skewed synthetic DOIs — heavy null/dup keys — and assert golden
counts + plan properties").

Every row is a pure function of ``spark.range`` ids, so the same spec can
be mirrored in plain Python to compute expected (golden) counts
independently of the Spark pipeline under test.

DOI skew spec, per source (id space ``[0, n)``):
- ``id % 10 ∈ {0,1,2}`` → NULL doi (30% — the null-key bucket the unify
  pipeline must drop before its windows)
- ``id % 10 == 3``     → junk doi (< 5 chars — fails the reference's
  length-based junk filter, materialize_unified_papers.py:116)
- ``id % 10 == 4``     → THE hot key ``10.1/hot`` (10% of every source
  collapses onto one DOI — the degenerate dedup-window bucket)
- otherwise            → ``10.1/x.{id % space}`` (moderate duplication:
  each surviving DOI appears ~n/(2·space)+ times)

``space`` differs per source so the three sources overlap partially —
the spine is a genuine union, and coverage flags differ per DOI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT = "10.1/hot"


def _doi_expr(space: int) -> F.Column:
    i = F.col("id")
    return (
        F.when(i % 10 < 3, F.lit(None).cast("string"))
        .when(i % 10 == 3, F.lit("bad"))
        .when(i % 10 == 4, F.lit(f"https://doi.org/{HOT}"))
        .otherwise(F.concat(F.lit("https://doi.org/10.1/x."), (i % space).cast("string")))
    )


def _doi_py(i: int, space: int) -> str | None:
    """Python mirror of _doi_expr, WITHOUT the resolver prefix (the
    pipeline's clean_doi strips it)."""
    m = i % 10
    if m < 3:
        return None
    if m == 3:
        return None  # junk never survives is_valid_doi
    if m == 4:
        return HOT
    return f"10.1/x.{i % space}"


def synth_openalex(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.format_string("https://openalex.org/W%09d", F.col("id")).alias("id"),
        _doi_expr(n // 2).alias("doi"),
        F.concat(F.lit("Title "), F.col("id").cast("string")).alias("title"),
        (1950 + F.col("id") % 75).cast("int").alias("publication_year"),
        ((F.col("id") * 37) % 1000).cast("int").alias("cited_by_count"),
        (F.col("id") % 97 == 0).alias("is_retracted"),
    )


def synth_s2ag(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("corpusid"),
        F.struct(_doi_expr((n * 3) // 4).alias("DOI")).alias("externalids"),
        F.concat(F.lit("S2 Title "), F.col("id").cast("string")).alias("title"),
        (1950 + F.col("id") % 75).cast("int").alias("year"),
        ((F.col("id") * 13) % 800).cast("int").alias("citationcount"),
    )


def synth_sciscinet(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.format_string("W%09d", F.col("id")).alias("paperid"),
        _doi_expr(n).alias("doi"),
        ((F.col("id") * 7) % 500).cast("int").alias("citation_count"),
        # every 11th row carries junk the DOUBLE cast must tolerate
        F.when(F.col("id") % 11 == 0, F.lit("inf"))
        .otherwise(((F.col("id") % 100) / 100.0).cast("string"))
        .alias("disruption"),
    )


def synth_retractions(spark: SparkSession, n: int) -> DataFrame:
    """Retraction list hitting every 50th surviving x-DOI of the OA space."""
    return spark.range(n).select(
        F.concat(
            F.lit("https://doi.org/10.1/x."), (F.col("id") * 50 % (n * 10)).cast("string")
        ).alias("original_paper_doi")
    )


def synth_code_links(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.concat(F.lit("10.1/x."), (F.col("id") * 31 % (n * 10)).cast("string")).alias("doi")
    )


def expected_source_dois(n: int, space: int) -> set[str]:
    """Python-mirror golden set: distinct valid DOIs one source emits."""
    return {d for i in range(n) if (d := _doi_py(i, space)) is not None}


def expected_unified(n_oa: int, n_s2: int, n_sci: int) -> dict[str, object]:
    """Golden counts for build_unified_papers over the synthetic trio."""
    oa = expected_source_dois(n_oa, n_oa // 2)
    s2 = expected_source_dois(n_s2, (n_s2 * 3) // 4)
    sci = expected_source_dois(n_sci, n_sci)
    spine = oa | s2 | sci
    return {
        "rows": len(spine),
        "has_openalex": len(oa),
        "has_s2ag": len(s2),
        "has_sciscinet": len(sci),
        "oa_dois": oa,
        "s2_dois": s2,
        "sci_dois": sci,
    }
