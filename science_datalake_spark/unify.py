"""Multi-source unification: the engine's flagship materialization.

Re-expresses the reference's ``materialize_unified_papers.py`` as one
declarative DataFrame job:

1. per-source DOI normalization + junk filter (``:80-124``)
2. per-source window dedup — top-1 per DOI by citation priority (``:126-264``)
3. distinct-DOI spine + left-join fan-in (``:266-407``)
4. COALESCE source-preference columns + coverage flags (``:348-396``)

Scale design (the reference does this at 293M output rows / 588M inputs):
- null/short DOIs filtered BEFORE the dedup windows (kills the null-key
  skew bucket; reference line :116).
- every per-source dedup and the fan-in join shuffle on the SAME key
  (doi), so Spark reuses the partitioning across stages where possible.
- small sources (retractions ~60K, code links ~141K) broadcast — the
  6-way join then costs one shuffle of each big side, nothing more.
- deterministic tie-breaks (unique id appended to every window order) so
  golden counts reproduce under any parallelism (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from science_datalake_spark.functions import clean_doi, is_valid_doi
from science_datalake_spark.operators.windows import top1_per_key


def _keyed(df: DataFrame, doi_col: str) -> DataFrame:
    """Normalize + filter the DOI key (junk/null rows never reach windows)."""
    return df.withColumn("doi", clean_doi(F.col(doi_col))).filter(is_valid_doi(F.col("doi")))


def prepare_openalex(works: DataFrame) -> DataFrame:
    """OpenAlex-shaped input: url-prefixed ids, https-prefixed DOIs."""
    keyed = _keyed(
        works.select(
            F.col("id").alias("openalex_id"),
            F.col("doi").alias("raw_doi"),
            F.col("title").alias("oa_title"),
            F.col("publication_year").alias("oa_year"),
            F.col("cited_by_count").alias("oa_cited_by_count"),
            F.col("is_retracted").alias("oa_is_retracted"),
        ),
        "raw_doi",
    ).drop("raw_doi")
    return top1_per_key(
        keyed,
        keys=["doi"],
        order=[F.desc_nulls_last("oa_cited_by_count"), F.asc("openalex_id")],
    )


def prepare_s2ag(papers: DataFrame) -> DataFrame:
    """S2AG-shaped input: corpusid PK, DOI nested at externalids.DOI
    (struct projection P1, create_unified_db.py:81-90)."""
    keyed = _keyed(
        papers.select(
            F.col("corpusid"),
            F.col("externalids.DOI").alias("raw_doi"),
            F.col("title").alias("s2_title"),
            F.col("year").alias("s2_year"),
            F.col("citationcount").alias("s2_citationcount"),
        ),
        "raw_doi",
    ).drop("raw_doi")
    return top1_per_key(
        keyed,
        keys=["doi"],
        order=[F.desc_nulls_last("s2_citationcount"), F.asc("corpusid")],
    )


def prepare_sciscinet(metrics: DataFrame) -> DataFrame:
    """SciSciNet-shaped input: bare W-ids, https-prefixed DOIs, metrics."""
    keyed = _keyed(
        metrics.select(
            F.col("paperid").alias("sci_paperid"),
            F.col("doi").alias("raw_doi"),
            F.col("citation_count").alias("sci_citation_count"),
            # tolerant cast: the raw column carries junk like 'inf'
            # (reference models it as DOUBLE, materialize_unified_papers.py:337)
            F.expr("try_cast(disruption AS DOUBLE)").alias("disruption"),
        ),
        "raw_doi",
    ).drop("raw_doi")
    return top1_per_key(
        keyed,
        keys=["doi"],
        order=[F.desc_nulls_last("sci_citation_count"), F.asc("sci_paperid")],
    )


def build_unified_papers(
    oa: DataFrame,
    s2: DataFrame,
    sci: DataFrame,
    retractions: DataFrame | None = None,
    code_links: DataFrame | None = None,
) -> DataFrame:
    """The 6-way DOI fan-in with coverage flags.

    ``retractions`` needs a ``original_paper_doi`` column; ``code_links``
    a ``doi`` column. Both are treated as broadcast-sized dims.
    """
    oa_k = prepare_openalex(oa)
    s2_k = prepare_s2ag(s2)
    sci_k = prepare_sciscinet(sci)

    spine = (
        oa_k.select("doi")
        .unionByName(s2_k.select("doi"))
        .unionByName(sci_k.select("doi"))
        .distinct()
    )

    unified = (
        spine.join(oa_k, "doi", "left")
        .join(s2_k, "doi", "left")
        .join(sci_k, "doi", "left")
    )

    if retractions is not None:
        rw = (
            _keyed(retractions, "original_paper_doi")
            .select("doi")
            .distinct()
            .withColumn("rw_hit", F.lit(True))
        )
        unified = unified.join(F.broadcast(rw), "doi", "left")
    else:
        unified = unified.withColumn("rw_hit", F.lit(None).cast("boolean"))

    if code_links is not None:
        pwc = (
            _keyed(code_links, "doi")
            .select("doi")
            .distinct()
            .withColumn("pwc_hit", F.lit(True))
        )
        unified = unified.join(F.broadcast(pwc), "doi", "left")
    else:
        unified = unified.withColumn("pwc_hit", F.lit(None).cast("boolean"))

    return unified.select(
        "doi",
        F.coalesce("oa_title", "s2_title").alias("title"),
        F.coalesce("oa_year", "s2_year").alias("year"),
        "openalex_id",
        "corpusid",
        "sci_paperid",
        "oa_cited_by_count",
        "s2_citationcount",
        "sci_citation_count",
        "disruption",
        F.col("openalex_id").isNotNull().alias("has_openalex"),
        F.col("corpusid").isNotNull().alias("has_s2ag"),
        F.col("sci_paperid").isNotNull().alias("has_sciscinet"),
        F.coalesce(F.col("pwc_hit"), F.lit(False)).alias("has_pwc"),
        F.coalesce(F.col("rw_hit"), F.lit(False)).alias("has_retraction"),
        # OR of both signals: an OpenAlex false must not mask a Retraction
        # Watch hit (OA lags RW), or is_retracted would contradict
        # has_retraction on the same row
        (
            F.coalesce("oa_is_retracted", F.lit(False))
            | F.coalesce(F.col("rw_hit"), F.lit(False))
        ).alias("is_retracted"),
    )


def coverage_upset(unified: DataFrame) -> DataFrame:
    """2^k coverage-combination counts (materialize_unified_papers.py:502-509)."""
    flags = ["has_openalex", "has_s2ag", "has_sciscinet", "has_pwc", "has_retraction"]
    return unified.groupBy(*flags).agg(F.count("*").alias("n")).orderBy(*flags)
