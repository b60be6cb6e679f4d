"""Window operators — the reference's single critical window pattern.

Reference parallel: ``QUALIFY ROW_NUMBER() OVER (PARTITION BY doi ORDER BY
cited_by_count DESC NULLS LAST) = 1`` is the workhorse dedup used before
every big join (materialize_unified_papers.py:146-149,173-176,205-208;
materialize_fulltext.py:96-120). Spark has no QUALIFY — the idiom is
window + filter, which Catalyst plans as a single Window exec after one
shuffle on the partition keys.

Scale notes: PARTITION BY doi over ~588M rows is a full shuffle on the key.
Null/junk keys are filtered BEFORE the window (the reference does the same:
``WHERE doi IS NOT NULL AND LENGTH(doi)>=5``) so the null-key skew bucket
never exists. Tie-breaks MUST be total orders (append a unique key) or
row_number is nondeterministic under parallelism and golden counts drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_key(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    """Keep the single best row per key group (dedup-by-priority, W1).

    ``order`` must define a total order within each key group (append a
    unique id as the last sort key) for deterministic results.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_key(df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int) -> DataFrame:
    """Top-k rows per key group (kNN post-filter, per-group leaderboards)."""
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank")
    )
