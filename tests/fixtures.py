"""Deterministic in-memory fixtures matching FIXTURES.md F1-F8 shapes:
nested structs/arrays, DOI format variants, dedup ties, priority conflicts.
Seeded so golden counts are stable forever."""

from __future__ import annotations

import random

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SEED = 1234

WAKEFIELD_DOI = "10.1016/s0140-6736(97)11096-0"


def papers_a(spark: SparkSession):
    """F1: S2AG-style — nested externalids struct, authors array, duplicate
    DOIs with citation ties."""
    rng = random.Random(SEED)
    schema = StructType(
        [
            StructField("corpusid", LongType()),
            StructField("title", StringType()),
            StructField("year", LongType()),
            StructField("citationcount", LongType()),
            StructField(
                "authors",
                ArrayType(
                    StructType(
                        [
                            StructField("authorId", StringType()),
                            StructField("name", StringType()),
                        ]
                    )
                ),
            ),
            StructField(
                "externalids",
                StructType([StructField("DOI", StringType())]),
            ),
        ]
    )
    rows = []
    for i in range(300):
        doi = f"10.{1000 + i % 200}/art.{i % 200}"  # 100 duplicate DOIs
        # citation counts correlated across sources: shared per-DOI base
        base = ((i % 200) * 37) % 480
        cites = base + rng.randint(0, 40) if i % 17 else base  # exact ties sometimes
        year = rng.randint(1980, 2024) if i % 50 else None
        title = None if i % 43 == 0 else f"Paper {i % 200} about topic {i % 7}"
        authors = (
            [(f"A{j}", f"Author {j}") for j in range(i % 4)] if i % 11 else None
        )
        if i % 37 == 0:
            doi = "bad"  # junk DOI (< 5 chars) — must be filtered
        rows.append((i, title, year, cites, authors, (doi,)))
    rows.append((9001, "The Wakefield-like paper", 1998, 900, None, (WAKEFIELD_DOI,)))
    return spark.createDataFrame(rows, schema)


def works_b(spark: SparkSession):
    """F2: OpenAlex-style — URL-prefixed ids, https-prefixed DOIs, some
    malformed embedded DOIs, inverted-index JSON abstracts."""
    rng = random.Random(SEED + 1)
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("doi", StringType()),
            StructField("title", StringType()),
            StructField("publication_year", IntegerType()),
            StructField("language", StringType()),
            StructField("cited_by_count", LongType()),
            StructField("is_retracted", BooleanType()),
            StructField("abstract_inverted_index", StringType()),
        ]
    )
    rows = []
    for i in range(350):
        base = f"10.{1000 + i % 220}/art.{i % 220}"  # ~60% overlap with F1
        doi = f"https://doi.org/{base}"
        if i % 31 == 0:
            doi = f"10.9999/junk/https://doi.org/{base}"  # embedded junk form
        cites = ((i % 220) * 37) % 480 + rng.randint(0, 40)
        inv = '{"the": [0, 3], "study": [1], "of": [2], "things": [4]}' if i % 5 else None
        rows.append(
            (
                f"https://openalex.org/W{7000 + i}",
                doi,
                f"Paper {i % 220} about topic {i % 7}",
                1980 + (i * 13) % 45,
                rng.choice(["en", "en", "en", "de", "zh"]),
                cites,
                i % 97 == 0,
                inv,
            )
        )
    rows.append(
        (
            "https://openalex.org/W9001",
            f"https://doi.org/{WAKEFIELD_DOI}",
            "The Wakefield-like paper",
            1998,
            "en",
            900,
            True,
            None,
        )
    )
    return spark.createDataFrame(rows, schema)


def metrics_c(spark: SparkSession):
    """F3: SciSciNet-style — bare W-ids, metrics with nulls/infinities."""
    rng = random.Random(SEED + 2)
    schema = StructType(
        [
            StructField("paperid", StringType()),
            StructField("doi", StringType()),
            StructField("citation_count", LongType()),
            StructField("disruption", StringType()),  # cast later; holds 'inf' junk
        ]
    )
    rows = []
    for i in range(250):
        base = f"10.{1000 + i % 180}/art.{i % 180}"
        rows.append(
            (
                f"W{7000 + i}",
                f"https://doi.org/{base}",
                ((i % 180) * 37) % 480 + rng.randint(0, 40),
                str(rng.uniform(-1, 1)) if i % 3 else "inf",
            )
        )
    rows.append(("W9001", f"https://doi.org/{WAKEFIELD_DOI}", 880, "0.9"))
    return spark.createDataFrame(rows, schema)


def retractions(spark: SparkSession):
    """F4: Retraction Watch-style small dim incl. the Wakefield-like row."""
    rows = [(1, WAKEFIELD_DOI, "Retraction", "2010-02-02")]
    return spark.createDataFrame(
        rows, "record_id INT, original_paper_doi STRING, retraction_nature STRING, retraction_date STRING"
    )


def code_links(spark: SparkSession):
    """F5: PWC-style — slug ids with DOIs for a handful of papers."""
    rows = [(f"paper-{i}", f"10.{1000 + i * 3}/art.{i * 3}") for i in range(12)]
    return spark.createDataFrame(rows, "paper_id STRING, doi STRING")


def fulltext_src(spark: SparkSession):
    """F8: multi-source fulltext with duplicate DOIs across sources,
    priority conflicts, text-length ties, and junk DOI forms."""
    rng = random.Random(SEED + 3)
    rows = []
    sources = ["pmc", "s2orc", "pes2o", "arxiv"]
    for i in range(150):
        doi_base = f"10.{2000 + i % 60}/ft.{i % 60}"  # 60 distinct DOIs
        src = sources[i % 4]
        if i % 29 == 0:
            doi = f"https://doi.org/{doi_base}"
        elif i % 23 == 0:
            doi = f"junk/https://doi.org/{doi_base}"
        else:
            doi = doi_base
        text_len = [5000, 5000, 120, 0][i % 4] + (i % 7) * 10
        text = "x" * text_len
        rows.append(
            (doi, src, f"Title {i % 60}", text, 2000 + i % 20, f"{src}:{i}")
        )
    return spark.createDataFrame(
        rows, "doi STRING, source STRING, title STRING, text STRING, year INT, source_id STRING"
    )
