"""Sampling operators: exact-n, seeded, and stratified.

Reference parallels:
- ``USING SAMPLE n`` spot checks (build_embedding_linkage.py:649-656,
  sanity_checks cells 5/7) → ``exact_n_sample`` (df.sample is fractional;
  exact-n needs rank-over-random).
- the stratified gold-standard sample: 300 pairs drawn 50/100/100/50 by
  similarity tier, seeded rng, proportional per ontology
  (evaluate_ontology_alignment.py:49-177) → ``stratified_sample``.

Determinism: rand(seed) is deterministic per row ONLY for a fixed
partitioning, so neither operator uses it. Both instead order rows by a
seeded ``xxhash64`` of ``key_col`` — a pure function of the row's key, so
same seed + same data ⇒ same sample under ANY input partitioning. This
requires ``key_col`` values to be unique (a duplicated key hashes to a
tie, broken by the secondary key_col sort, which is then also tied —
sample membership at the boundary becomes arbitrary). That is what makes
a sampled gold set reproducible (record once, annotate once, evaluate
forever).

Scale: one shuffle + one window; the window partitions by stratum so no
single task sees more than a stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_n_sample(df: DataFrame, n: int, key_col: str, seed: int = 42) -> DataFrame:
    """Exactly-n uniform sample, reproducible across runs/partitionings.

    Rank rows by a seeded hash of the key (not rand(), whose values depend
    on row-to-partition assignment) and keep the first n.

    Scale note: the global rank is computed as a per-partition top-n
    (sortWithinPartitions + local limit via window on a constant key would
    still single-partition), so we use orderBy(...).limit(n), which Spark
    plans as TakeOrderedAndProject — each partition keeps n candidates,
    only n·partitions rows reach the driver-side merge. No global window.
    """
    scored = df.withColumn("__r", F.xxhash64(F.col(key_col), F.lit(seed)))
    return scored.orderBy("__r", key_col).limit(n).drop("__r")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: dict[str, int] | int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly-n-per-stratum sample (the gold-standard sampling design).

    ``n_per_stratum``: one n for all strata, or a per-stratum dict (the
    reference's 50/100/100/50 tier design). Deterministic per (data, seed).
    """
    scored = df.withColumn("__r", F.xxhash64(F.col(key_col), F.lit(seed)))
    w = Window.partitionBy(stratum_col).orderBy("__r", key_col)
    ranked = scored.withColumn("__rn", F.row_number().over(w))
    if isinstance(n_per_stratum, int):
        kept = ranked.filter(F.col("__rn") <= n_per_stratum)
    else:
        quota = F.lit(0)
        for stratum, n in n_per_stratum.items():
            quota = F.when(F.col(stratum_col) == stratum, n).otherwise(quota)
        kept = ranked.filter(F.col("__rn") <= quota)
    return kept.drop("__r", "__rn")


def similarity_tiers(sim: F.Column) -> F.Column:
    """The reference's similarity strata: ≥.95 exact / ≥.85 high /
    ≥.75 mid / ≥.65 borderline (evaluate_ontology_alignment.py:49-76)."""
    return (
        F.when(sim >= 0.95, "exact")
        .when(sim >= 0.85, "high")
        .when(sim >= 0.75, "mid")
        .when(sim >= 0.65, "borderline")
        .otherwise("below")
    )
