"""Automated sanity suite — the port of the reference's 10 end-to-end
validation checks (notebooks/sanity_checks.ipynb; technical_validation.tex:8-30).

Each check returns (name, passed, detail). ``run_all`` executes every check
applicable to the supplied tables. All checks are single Spark actions over
declarative plans — they run unchanged at 100 TB (counts/aggregations only,
nothing collects row-level data to the driver).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    passed: bool
    detail: str

    def __str__(self) -> str:
        return f"[{'PASS' if self.passed else 'FAIL'}] {self.name}: {self.detail}"


def check_doi_format(unified: DataFrame) -> CheckResult:
    """#1: no http-prefixed or uppercase DOIs survive normalization."""
    bad = unified.filter(
        F.col("doi").like("http%") | (F.col("doi") != F.lower(F.col("doi")))
    ).count()
    return CheckResult("doi_format", bad == 0, f"{bad} malformed DOIs")


def check_flags_match_nullness(unified: DataFrame) -> CheckResult:
    """#2: coverage flags ≡ column nullness."""
    mismatches = unified.filter(
        (F.col("has_openalex") != F.col("openalex_id").isNotNull())
        | (F.col("has_s2ag") != F.col("corpusid").isNotNull())
        | (F.col("has_sciscinet") != F.col("sci_paperid").isNotNull())
    ).count()
    return CheckResult("flags_nullness", mismatches == 0, f"{mismatches} flag mismatches")


def check_pk_unique(unified: DataFrame, key: str = "doi") -> CheckResult:
    """#3: COUNT(*) == COUNT(DISTINCT doi)."""
    row = unified.agg(
        F.count("*").alias("n"), F.countDistinct(key).alias("nd")
    ).first()
    return CheckResult("pk_unique", row["n"] == row["nd"], f"{row['n']} rows / {row['nd']} distinct")


def check_referential_integrity(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> CheckResult:
    """#5: no orphan foreign keys (left-anti join)."""
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .join(parent.select(F.col(parent_key).alias("k")), "k", "left_anti")
        .count()
    )
    return CheckResult("referential_integrity", orphans == 0, f"{orphans} orphans")


def check_join_rate(left: DataFrame, right: DataFrame, key: str, min_rate: float = 0.85) -> CheckResult:
    """#6: cross-dataset join rate floor (the reference requires ≥85% on a
    RoS→OpenAlex sample)."""
    n = left.count()
    joined = left.join(right.select(key).distinct(), key, "left_semi").count()
    rate = joined / n if n else 0.0
    return CheckResult("join_rate", rate >= min_rate, f"{rate:.1%} (floor {min_rate:.0%})")


def check_citation_corr(unified: DataFrame, min_corr: float = 0.8, min_pairs_ok: int = 2) -> CheckResult:
    """#7: ≥2 of 3 pairwise citation-count correlations above 0.8."""
    row = unified.agg(
        F.corr("oa_cited_by_count", "s2_citationcount").alias("a"),
        F.corr("oa_cited_by_count", "sci_citation_count").alias("b"),
        F.corr("s2_citationcount", "sci_citation_count").alias("c"),
    ).first()
    vals = [row["a"], row["b"], row["c"]]
    ok = sum(1 for v in vals if v is not None and v > min_corr)
    return CheckResult(
        "citation_corr", ok >= min_pairs_ok, f"{ok}/3 pairs > {min_corr} ({vals})"
    )


def check_year_distribution(unified: DataFrame, lo: int = 1500, hi: int = 2026, max_bad: float = 0.01) -> CheckResult:
    """#8: NULL year < 1%, out-of-range year < 1%."""
    row = unified.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("year").isNull(), 1)).alias("null_year"),
        F.count(F.when((F.col("year") < lo) | (F.col("year") > hi), 1)).alias("oob_year"),
    ).first()
    n = max(row["n"], 1)
    ok = row["null_year"] / n < max_bad and row["oob_year"] / n < max_bad
    return CheckResult(
        "year_distribution", ok, f"null {row['null_year']}/{n}, oob {row['oob_year']}/{n}"
    )


def check_known_entity(unified: DataFrame, doi: str, expect_retracted: bool = True) -> CheckResult:
    """#9: known-row spot check (the Wakefield-1998 analogue)."""
    row = unified.filter(F.col("doi") == doi).select("has_retraction").first()
    found = row is not None and row["has_retraction"] == expect_retracted
    return CheckResult("known_entity", found, f"doi={doi} retraction flag ok={found}")


def check_retraction_rate(unified: DataFrame, max_rate: float = 0.01) -> CheckResult:
    """#9b: retraction rate sanity (<1%)."""
    row = unified.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("has_retraction"), 1)).alias("r"),
    ).first()
    rate = row["r"] / max(row["n"], 1)
    return CheckResult("retraction_rate", rate < max_rate, f"{rate:.2%}")


def check_golden_count(df: DataFrame, expected: int, label: str = "rows") -> CheckResult:
    """#10: exact golden-count reproducibility."""
    n = df.count()
    return CheckResult(f"golden_{label}", n == expected, f"{n} (expected {expected})")


def run_core(unified: DataFrame) -> list[CheckResult]:
    """The checks that need only the unified table."""
    return [
        check_doi_format(unified),
        check_flags_match_nullness(unified),
        check_pk_unique(unified),
        check_citation_corr(unified),
        check_year_distribution(unified),
        check_retraction_rate(unified),
    ]
