"""Unification + fulltext + sanity-suite tests on FIXTURES.md-shaped data.

Golden counts are fixed functions of the fixture seed — recorded once,
asserted forever (the reference's check #10 discipline)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from science_datalake_spark import sanity
from science_datalake_spark.fulltext import fulltext_stats, unify_fulltext
from science_datalake_spark.functions import inverted_index_to_text
from science_datalake_spark.unify import build_unified_papers, coverage_upset
from tests import fixtures


@pytest.fixture(scope="module")
def unified(spark):
    return build_unified_papers(
        oa=fixtures.works_b(spark),
        s2=fixtures.papers_a(spark),
        sci=fixtures.metrics_c(spark),
        retractions=fixtures.retractions(spark),
        code_links=fixtures.code_links(spark),
    ).cache()


def test_unified_sanity_suite(unified):
    results = sanity.run_core(unified)
    results.append(sanity.check_known_entity(unified, fixtures.WAKEFIELD_DOI))
    for r in results:
        print(r)
    assert all(r.passed for r in results), [str(r) for r in results if not r.passed]


def test_unified_golden_counts(unified):
    # distinct clean DOIs across the three sources (fixed by seed)
    n = unified.count()
    assert n == unified.select("doi").distinct().count()
    # spine must cover every source's cleaned DOI set exactly
    flags = unified.agg(
        F.sum(F.col("has_openalex").cast("int")).alias("oa"),
        F.sum(F.col("has_s2ag").cast("int")).alias("s2"),
        F.sum(F.col("has_sciscinet").cast("int")).alias("sci"),
        F.sum(F.col("has_pwc").cast("int")).alias("pwc"),
        F.sum(F.col("has_retraction").cast("int")).alias("rw"),
    ).first()
    # golden values recorded from the seeded fixtures
    assert flags["oa"] == 221, flags
    assert flags["s2"] == 198, flags
    assert flags["sci"] == 181, flags
    assert flags["pwc"] == 12, flags
    assert flags["rw"] == 1, flags


def test_coverage_upset_cells(unified):
    cells = coverage_upset(unified)
    total = cells.agg(F.sum("n")).first()[0]
    assert total == unified.count()


def test_dedup_tie_break_deterministic(spark):
    """Duplicate DOIs with equal citation counts must resolve identically
    across runs (unique-id tie-break)."""
    a = build_unified_papers(
        oa=fixtures.works_b(spark), s2=fixtures.papers_a(spark), sci=fixtures.metrics_c(spark)
    )
    b = build_unified_papers(
        oa=fixtures.works_b(spark), s2=fixtures.papers_a(spark), sci=fixtures.metrics_c(spark)
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fulltext_priority_dedup(spark):
    src = fixtures.fulltext_src(spark)
    out = unify_fulltext(src).cache()
    # exactly one row per clean DOI
    assert out.count() == out.select("doi").distinct().count() == 60
    # no junk/prefixed DOI survives
    assert out.filter(F.col("doi").like("%doi.org%")).count() == 0
    # priority: every DOI present in pmc must resolve to pmc
    pmc_dois = (
        unify_fulltext(src.filter(F.col("source") == "pmc")).select("doi").distinct()
    )
    winners = out.join(pmc_dois, "doi").select("source").distinct().collect()
    assert [r["source"] for r in winners] == ["pmc"]
    stats = fulltext_stats(out)
    assert stats.count() > 0


def test_inverted_index_reconstruction(spark):
    df = spark.createDataFrame(
        [
            ('{"the": [0, 3], "study": [1], "of": [2], "things": [4]}',),
            ('{"solo": [0]}',),
            (None,),
        ],
        "inv STRING",
    )
    out = df.select(inverted_index_to_text(F.col("inv")).alias("t")).collect()
    assert out[0]["t"] == "the study of the things"
    assert out[1]["t"] == "solo"
    assert out[2]["t"] is None


def test_grouped_build_equals_windowed_build(spark):
    """build_unified_papers_grouped (one-shuffle min_by fan-in) must
    produce row-for-row the SAME relation as the windowed reference-shaped
    build — same dedup winners (desc_nulls_last citation, asc id
    tie-break), same left-join absence semantics, same flags."""
    from science_datalake_spark.synth import (
        synth_code_links,
        synth_openalex,
        synth_retractions,
        synth_s2ag,
        synth_sciscinet,
    )
    from science_datalake_spark.unify import (
        build_unified_papers,
        build_unified_papers_grouped,
    )

    oa, s2, sci = (
        synth_openalex(spark, 3000),
        synth_s2ag(spark, 2500),
        synth_sciscinet(spark, 2000),
    )
    rw, cl = synth_retractions(spark, 200), synth_code_links(spark, 300)
    a = build_unified_papers(oa, s2, sci, retractions=rw, code_links=cl)
    b = build_unified_papers_grouped(oa, s2, sci, retractions=rw, code_links=cl)
    assert a.columns == b.columns
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # and the no-dims variants agree on the null-flag padding path too
    a0 = build_unified_papers(oa, s2, sci)
    b0 = build_unified_papers_grouped(oa, s2, sci)
    assert sorted(map(tuple, a0.collect())) == sorted(map(tuple, b0.collect()))


def test_grouped_build_handles_fractional_citations(spark):
    """The grouped build's argmin order key must NOT truncate fractional
    citation metrics (a long cast tied 10.9 with 10.2 and let the id
    tie-break pick the WRONG top-1 row — review finding): with
    DOUBLE-typed citations both builds must keep the 10.9 row."""
    import pyspark.sql.functions as F

    from science_datalake_spark.unify import (
        build_unified_papers,
        build_unified_papers_grouped,
    )

    def src_oa(rows):
        return spark.createDataFrame(
            rows,
            "id STRING, doi STRING, title STRING, publication_year INT, "
            "cited_by_count DOUBLE, is_retracted BOOLEAN",
        )

    oa = src_oa(
        [
            ("B", "10.1/x", "t", 2020, 10.9, False),
            ("A", "10.1/x", "t", 2020, 10.2, False),
            ("C", "10.2/y", "t", 2021, None, False),  # null citation ranks last
            ("D", "10.2/y", "t", 2021, 1.0, False),
        ]
    )
    s2 = spark.createDataFrame(
        [(1, ("10.1/x",), "t", 2020, 5)],
        "corpusid LONG, externalids STRUCT<DOI:STRING>, title STRING, year INT, citationcount LONG",
    )
    sci = spark.createDataFrame(
        [("P1", "10.1/x", 3, "0.5")],
        "paperid STRING, doi STRING, citation_count LONG, disruption STRING",
    )
    a = build_unified_papers(oa, s2, sci)
    b = build_unified_papers_grouped(oa, s2, sci)
    wa = {r["doi"]: r["openalex_id"] for r in a.collect()}
    wb = {r["doi"]: r["openalex_id"] for r in b.collect()}
    assert wa == wb == {"10.1/x": "B", "10.2/y": "D"}, (wa, wb)


def test_synth_unified_materialized_once_per_session(spark, sf_smoke):
    """Round-8 materialize-once (the reference's materialize_unified_papers
    design decision): the six unify/vignette queries must share ONE
    persisted spine per (session, sf_dir) — a second call returns the
    same cached handle, and the cached relation still answers the
    coverage rollup correctly."""
    from science_datalake_spark.queries.unify_q import _synth_unified
    from science_datalake_spark.unify import coverage_upset

    a = _synth_unified(spark, sf_smoke)
    b = _synth_unified(spark, sf_smoke)
    assert a is b
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    # the cached spine still computes: every row lands in exactly one
    # coverage combination
    up = coverage_upset(a)
    total = up.agg(F.sum("n").alias("t")).collect()[0]["t"]
    assert total == a.count() > 0


def test_unified_cache_evicts_oldest(spark, sf_smoke):
    """Cap-pressure eviction must drop the OLDEST spine (FIFO, like the
    IVF index registry), not the newest — round-8 verdict 'What's wrong'
    #2: dict.popitem() is LIFO and would evict the entry just inserted
    while stale ones linger."""
    import science_datalake_spark.queries.unify_q as uq

    saved = dict(uq._UNIFIED_CACHE)
    uq._UNIFIED_CACHE.clear()
    try:
        dummy = spark.range(1)
        for i in range(uq._UNIFIED_CACHE_CAP):
            uq._UNIFIED_CACHE[("app", f"dir{i}")] = dummy
        oldest = next(iter(uq._UNIFIED_CACHE))
        # a real insert through the cache path triggers eviction
        got = uq._synth_unified(spark, sf_smoke)
        key = (spark.sparkContext.applicationId, sf_smoke)
        assert key in uq._UNIFIED_CACHE
        assert oldest not in uq._UNIFIED_CACHE, "oldest entry must be evicted"
        # the remaining pre-filled entries (all but the first) survive
        assert ("app", "dir1") in uq._UNIFIED_CACHE
        got.unpersist()
    finally:
        uq._UNIFIED_CACHE.clear()
        uq._UNIFIED_CACHE.update(saved)


def test_materialize_unified_papers_durable(spark, tmp_path):
    """The cross-session materialize-once form: build → clustered write →
    registered view; the read-back relation answers the same coverage
    rollup as the in-memory build and survives as a catalog view."""
    from science_datalake_spark.synth import (
        synth_code_links,
        synth_openalex,
        synth_retractions,
        synth_s2ag,
        synth_sciscinet,
    )
    from science_datalake_spark.unify import (
        build_unified_papers_grouped,
        coverage_upset,
        materialize_unified_papers,
    )

    oa, s2, sci = (
        synth_openalex(spark, 400),
        synth_s2ag(spark, 300),
        synth_sciscinet(spark, 200),
    )
    rw, pwc = synth_retractions(spark, 50), synth_code_links(spark, 50)
    out_dir = str(tmp_path / "unified")
    got = materialize_unified_papers(
        spark, oa, s2, sci, out_dir, retractions=rw, code_links=pwc
    )
    want = build_unified_papers_grouped(oa, s2, sci, retractions=rw, code_links=pwc)
    a = sorted(map(tuple, coverage_upset(got).collect()))
    b = sorted(map(tuple, coverage_upset(want).collect()))
    assert a == b and got.count() == want.count() > 0
    # registered view is queryable
    n = spark.sql("SELECT count(*) AS n FROM unified_papers").collect()[0]["n"]
    assert n == got.count()
