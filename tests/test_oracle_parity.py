"""Mirror of the driver's t2 gate: every queries() entry vs its DuckDB oracle
at sf0.01 — row count, sorted-column names, and canonicalized values."""

from __future__ import annotations

import pytest

from science_datalake_spark.oracle import check_parity, duckdb_connection
from science_datalake_spark.queries import load_all, load_aux

QUERIES, ORACLE = load_all()
_AUX_Q, _AUX_O = load_aux()
QUERIES.update(_AUX_Q)  # aux queries get the same local parity gate
ORACLE.update(_AUX_O)


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_connection(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_oracle, con):
    if name not in ORACLE:
        # rows-only check, like the driver's weaker path
        df = QUERIES[name](spark, sf_oracle)
        assert df.count() >= 0
        return
    res = check_parity(name, QUERIES[name](spark, sf_oracle), con, ORACLE[name])
    assert res.ok, str(res)


def test_gate_catches_hugeint_vs_bigint(spark, sf_oracle, con):
    """Regression for the round-10 RED driver row: an oracle whose final
    sum(CASE...) is left uncast comes back HUGEINT -> pandas float64
    ("3.0"), while Spark emits int64 ("3"); the driver's value hash
    rejects that even though canonicalized values match. The local gate
    must mirror the driver and FAIL on the numeric-kind mismatch."""
    sdf = spark.sql("SELECT 'a' AS k, CAST(3 AS BIGINT) AS n")
    good = check_parity(
        "typed_ok", sdf, con, "SELECT 'a' AS k, CAST(3 AS BIGINT) AS n"
    )
    assert good.ok, str(good)
    # uncast sum over INTEGER -> HUGEINT in DuckDB
    bad = check_parity(
        "typed_red",
        sdf,
        con,
        "SELECT 'a' AS k, sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS n"
        " FROM (VALUES (1), (1), (1)) t(x)",
    )
    assert not bad.ok
    assert any("dtype kind" in m for m in bad.mismatches), str(bad)
