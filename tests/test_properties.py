"""Property-based tests (hypothesis) for the pure scalar logic the engine
depends on most: DOI cleaning, Jaro-Winkler, SQL guard, OBO parsing."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from science_datalake_spark.cli import UnsafeSQLError, guard_sql
from science_datalake_spark.operators.linkage import jaro_winkler_py

TEXT = st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=30)


@given(TEXT, TEXT)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_properties(a, b):
    s = jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    assert jaro_winkler_py(b, a) == pytest.approx(s)  # symmetric
    if a and a == b:
        assert s == 1.0


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_jaro_winkler_matches_duckdb(pairs):
    con = duckdb.connect()
    for a, b in pairs:
        d = con.sql("SELECT jaro_winkler_similarity(?, ?)", params=[a, b]).fetchone()[0]
        assert jaro_winkler_py(a, b) == pytest.approx(d, abs=1e-12)
    con.close()


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_guard_sql_never_allows_ddl(sql):
    try:
        guarded = guard_sql(sql)
    except UnsafeSQLError:
        return
    low = guarded.lower()
    assert low.startswith(("select", "with"))
    for kw in ("drop", "delete", "insert", "update", "create", "truncate"):
        assert f" {kw} " not in f" {low} "
    assert "limit" in low


@given(st.integers(min_value=0, max_value=3))
def test_clean_doi_idempotent_on_variants(variant):
    """clean_doi(clean_doi(x)) == clean_doi(x) for all synthesized forms —
    checked via DuckDB on the same expression semantics."""
    base = "10.1234/some.id"
    forms = [base, f"https://doi.org/{base}", f"HTTPS://DOI.ORG/{base}", f"doi.org/{base}"]
    raw = forms[variant]
    con = duckdb.connect()
    clean = con.sql(
        "SELECT lower(coalesce(nullif(regexp_extract(lower(?), 'doi\\.org/(.+)$', 1), ''), ?))",
        params=[raw, raw],
    ).fetchone()[0]
    clean2 = con.sql(
        "SELECT lower(coalesce(nullif(regexp_extract(lower(?), 'doi\\.org/(.+)$', 1), ''), ?))",
        params=[clean, clean],
    ).fetchone()[0]
    assert clean == base == clean2
    con.close()
