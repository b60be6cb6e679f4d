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
