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


def weighted_sample(
    df: DataFrame,
    n: int,
    key_col: str,
    weight_col: str,
    seed: int = 42,
    es_col: str | None = None,
) -> DataFrame:
    """Exactly-n sample WITHOUT replacement with inclusion probability
    proportional to ``weight_col`` (Efraimidis & Spirakis 2006, algorithm
    A-ES): each row gets key k_i = u_i^(1/w_i) with u_i ~ U(0,1]; the n
    largest keys are a weighted sample without replacement. We rank by the
    monotone transform ln(u_i)/w_i so the key never underflows (u^(1/w)
    rounds to 0.0 in float64 once w is small relative to -ln u).

    u_i is NOT rand(): like the other samplers in this module it derives
    from a digest of the row's key — ``md5(key || ':' || seed)`` first 8
    hex chars as a uint32 — so the sample is a pure function of (data,
    seed) under any partitioning, and the DuckDB twin can compute the
    identical u (md5 is oracle-portable; xxhash64 is not).

    Rows with weight <= 0 or NULL are excluded (zero mass).

    Scale: map-only projection + TakeOrderedAndProject — each partition
    keeps its local top-n, only n·partitions rows reach the driver merge.
    Zero shuffles; this is the weighted analogue of ``exact_n_sample``.
    The canonical corpus use: token-budget subsampling where long
    documents must be drawn proportionally to their token count.

    ``es_col``: optionally keep the ranking key (ln u / w) as a column.
    """
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (u32.cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    es = F.log(u) / F.col(weight_col).cast("double")
    scored = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es", es)
    kept = scored.orderBy(F.desc("__es"), key_col).limit(n)
    if es_col is not None:
        return kept.withColumnRenamed("__es", es_col)
    return kept.drop("__es")


def weighted_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: dict[str, int] | int,
    key_col: str,
    weight_col: str,
    seed: int = 42,
    es_col: str | None = None,
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: within each
    stratum, exactly-n rows drawn with probability proportional to
    ``weight_col`` (A-ES ranking key ln(u)/w as in ``weighted_sample``,
    ranked by a window PARTITIONED on the stratum). The balanced-corpus
    design: per-language quotas where long documents must still be drawn
    proportionally to their token mass.

    Scale: one shuffle (the stratum window); no task sees more than a
    stratum. Deterministic per (data, seed) under any partitioning.
    """
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (u32.cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    es = F.log(u) / F.col(weight_col).cast("double")
    scored = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es", es)
    w = Window.partitionBy(stratum_col).orderBy(F.desc("__es"), key_col)
    ranked = scored.withColumn("__rn", F.row_number().over(w))
    if isinstance(n_per_stratum, int):
        kept = ranked.filter(F.col("__rn") <= n_per_stratum)
    else:
        quota = F.lit(0)
        for stratum, n in n_per_stratum.items():
            quota = F.when(F.col(stratum_col) == stratum, n).otherwise(quota)
        kept = ranked.filter(F.col("__rn") <= quota)
    kept = kept.drop("__rn")
    if es_col is not None:
        return kept.withColumnRenamed("__es", es_col)
    return kept.drop("__es")


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
