"""Query library: every SURVEY.md §2 operator bound to the driver testdata.

Each query module registers callables ``(spark, sf_dir) -> DataFrame`` plus a
matching DuckDB oracle SQL string via the ``@query`` decorator. The
aggregated registries feed ``__spark_entry__.queries()`` / ``oracle_sql()``.

Column-name contract: every computed/aggregate column is aliased identically
in the Spark plan and the oracle SQL — the driver sorts columns by name
before value-hashing. Floating-point aggregates are rounded explicitly on
BOTH sides so cross-engine summation order can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all query modules and return the merged registries."""
    from science_datalake_spark.queries import (  # noqa: F401
        analytics,
        linkage_q,
        llm_pipeline,
        tpch,
    )

    return QUERIES, ORACLE
