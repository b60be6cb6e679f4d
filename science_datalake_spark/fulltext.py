"""Full-text corpus unification: priority dedup across overlapping sources.

Re-expresses ``materialize_fulltext.py``: each DOI may have text from
several sources (pmc > s2orc > pes2o > arxiv); keep exactly one row per
clean DOI — best source priority, then longest text, then stable id
(deterministic tie-break; the reference orders by
``CASE source priority ASC, text_length DESC`` at :96-120).

Scale: one window shuffle on doi after the junk filter. Big string columns
ride along only until the window filter drops losers — at 100 TB, project
the text column out of the window input and re-join winners if memory
pressure shows up (the reference's small-row-group tuning is the same
concern, convert_s2ag.py:37-70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from science_datalake_spark.functions import clean_doi, is_valid_doi
from science_datalake_spark.operators.windows import top1_per_key

#: Source priority — lower wins (materialize_fulltext.py:88-91).
SOURCE_PRIORITY = {"pmc": 1, "s2orc": 2, "pes2o": 3, "arxiv": 4}

#: peS2o rows below this text length are abstract-only (convert_fulltext.py
#: threshold semantics); used for the has_full_text flag.
FULL_TEXT_MIN_CHARS = 100


def source_priority(col: F.Column) -> F.Column:
    expr = F.lit(99)
    for src, pri in SOURCE_PRIORITY.items():
        expr = F.when(col == src, pri).otherwise(expr)
    return expr


def unify_fulltext(df: DataFrame) -> DataFrame:
    """Input columns: doi, source, title, text, year, source_id.
    Output: one row per clean DOI with the priority-winning text."""
    keyed = (
        df.withColumn("doi", clean_doi(F.col("doi")))
        .filter(is_valid_doi(F.col("doi")))
        .withColumn("priority", source_priority(F.col("source")))
        .withColumn("text_length", F.length(F.coalesce(F.col("text"), F.lit(""))))
    )
    best = top1_per_key(
        keyed,
        keys=["doi"],
        order=[
            F.asc("priority"),
            F.desc("text_length"),
            F.asc("source_id"),
        ],
    )
    return best.withColumn(
        "has_full_text", F.col("text_length") >= FULL_TEXT_MIN_CHARS
    ).drop("priority")


def fulltext_stats(unified: DataFrame) -> DataFrame:
    """Per-source corpus stats (materialize_fulltext.py:148-163 semantics)."""
    return (
        unified.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("doi").alias("n_dois"),
            F.count(F.when(F.col("has_full_text"), 1)).alias("n_full_text"),
            F.round(F.avg("text_length"), 2).alias("avg_text_length"),
            F.median("text_length").alias("median_text_length"),
        )
        .orderBy("source")
    )
