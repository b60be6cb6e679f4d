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


def _numeric_kind(series: pd.Series) -> str | None:
    """'int' / 'float' / 'decimal' for numeric columns, None otherwise.

    Mirrors the driver's hash semantics: the driver stringifies pandas
    cells WITHOUT coercing integral floats to ints, so a Spark int64
    column ("3") against a DuckDB HUGEINT->float64 column ("3.0") hash-
    mismatches even though `_canon_cell` makes them equal locally (the
    round-10 `dedup_incremental_bloom` RED row). All-null columns are
    exempt (pandas floats them on both sides)."""
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return None if series.isna().all() else "float"
    if kind == "O":
        for v in series:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            tn = type(v).__name__
            if tn == "Decimal":
                return "decimal"
            if isinstance(v, bool):
                return None
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return None
    return None


def check_parity(name, spark_df, con, sql) -> ParityResult:
    """Compare one Spark result against its DuckDB oracle."""
    sp_raw = spark_df.toPandas()
    oc_raw = con.sql(sql).df()
    sp = _canon(sp_raw)
    oc = _canon(oc_raw)
    res = ParityResult(name=name, ok=True, spark_rows=len(sp), oracle_rows=len(oc))
    if list(sp.columns) != list(oc.columns):
        res.ok = False
        res.mismatches.append(f"columns differ: spark={list(sp.columns)} oracle={list(oc.columns)}")
        return res
    for c in sp.columns:
        sk, ok_ = _numeric_kind(sp_raw[c]), _numeric_kind(oc_raw[c])
        # A NULL-bearing int column floats on the Spark side too, so
        # int-vs-float with nulls present matches the driver; a clean
        # int64 vs float64/decimal does not.
        if sk is not None and ok_ is not None and sk != ok_:
            if {sk, ok_} == {"int", "float"} and (
                sp_raw[c].isna().any() or oc_raw[c].isna().any()
            ):
                continue
            res.ok = False
            res.mismatches.append(
                f"numeric dtype kind differs on '{c}': spark={sk} oracle={ok_}"
                " (driver hash stringifies 3 vs 3.0 differently)"
            )
    if not res.ok:
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
