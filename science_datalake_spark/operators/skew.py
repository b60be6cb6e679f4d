"""Skew-aware aggregation: two-phase salted aggregates.

At 100 TB, a groupBy on a zipf-distributed key (DOI dedup windows, per-host
event counts) puts one key's entire volume on one reducer. AQE's skew-join
splitting handles joins, but a skewed AGGREGATE still funnels one key to
one task. The classic fix: salt the key (random shard per row), aggregate
partially per (key, salt), then merge partials per key — two small shuffles
instead of one skewed one.

Only algebraic aggregates decompose this way (count/sum/min/max/avg-as-
sum+count); median/exact-distinct do not. This module provides the
decomposable set; Spark's map-side partial aggregation already handles
moderate skew, so reach for this only when task-duration histograms show a
straggler (measure, don't guess).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregate: phase 1 groups by (keys + salt), phase 2 merges
    partials by keys. Output columns: ``n`` (if counts), ``sum_<c>``,
    ``min_<c>``, ``max_<c>``.

    The salt is uniform-random per row — correctness needs no determinism
    because every partial is merged; only the partition ASSIGNMENT varies
    run to run.
    """
    salted = df.withColumn("__salt", (F.rand() * salt_buckets).cast("int"))

    phase1: list[Column] = []
    if counts:
        phase1.append(F.count("*").alias("__n"))
    phase1 += [F.sum(c).alias(f"__sum_{c}") for c in sums]
    phase1 += [F.min(c).alias(f"__min_{c}") for c in mins]
    phase1 += [F.max(c).alias(f"__max_{c}") for c in maxs]
    partial = salted.groupBy(*keys, "__salt").agg(*phase1)

    phase2: list[Column] = []
    if counts:
        phase2.append(F.sum("__n").alias("n"))
    phase2 += [F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums]
    phase2 += [F.min(f"__min_{c}").alias(f"min_{c}") for c in mins]
    phase2 += [F.max(f"__max_{c}").alias(f"max_{c}") for c in maxs]
    return partial.groupBy(*keys).agg(*phase2)
