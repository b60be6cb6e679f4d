"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full SURVEY §2 operator inventory with DuckDB
oracles (see science_datalake_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from science_datalake_spark.queries import load_all

    qs, _ = load_all()
    return qs["top_customers_flagged"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from science_datalake_spark.queries import load_all

    qs, _ = load_all()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (ANSI, same column aliases)."""
    from science_datalake_spark.queries import load_all

    _, oracle = load_all()
    return dict(oracle)
