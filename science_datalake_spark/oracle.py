"""Local DuckDB-oracle harness mirroring the driver's t2 correctness gate.

Runs a Spark query and its DuckDB oracle SQL side-by-side on the same
Parquet tables, sorts columns by name, and compares row count + sorted
values. Used by tests/test_oracle_parity.py so every ``queries()`` entry is
self-verified before the driver ever sees it.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from science_datalake_spark.catalog import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the testdata tables as views, matching
    the driver's pre-registered view setup."""
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_cell)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _canon_cell(v: object) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        s = f"{self.name}: {'OK' if self.ok else 'FAIL'} (spark={self.spark_rows} oracle={self.oracle_rows})"
        for m in self.mismatches[:5]:
            s += f"\n  {m}"
        return s


def check_parity(name, spark_df, con, sql) -> ParityResult:
    """Compare one Spark result against its DuckDB oracle."""
    sp = _canon(spark_df.toPandas())
    oc = _canon(con.sql(sql).df())
    res = ParityResult(name=name, ok=True, spark_rows=len(sp), oracle_rows=len(oc))
    if list(sp.columns) != list(oc.columns):
        res.ok = False
        res.mismatches.append(f"columns differ: spark={list(sp.columns)} oracle={list(oc.columns)}")
        return res
    if len(sp) != len(oc):
        res.ok = False
        res.mismatches.append("row count mismatch")
        return res
    neq = (sp != oc).any(axis=1)
    if neq.any():
        res.ok = False
        for i in neq[neq].index[:5]:
            res.mismatches.append(f"row {i}: spark={sp.loc[i].to_dict()} oracle={oc.loc[i].to_dict()}")
    return res
