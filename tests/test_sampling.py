"""Sampling operators: exact-n and stratified (gold-standard design) —
reproducibility under different partitionings is the key property."""

from __future__ import annotations

import pyspark.sql.functions as F

from science_datalake_spark.catalog import table
from science_datalake_spark.operators.sampling import (
    exact_n_sample,
    similarity_tiers,
    stratified_sample,
)


def test_exact_n_reproducible_across_partitionings(spark, sf_oracle):
    o = table(spark, sf_oracle, "orders")
    s1 = exact_n_sample(o, 100, "o_orderkey", seed=7)
    s2 = exact_n_sample(o.repartition(17), 100, "o_orderkey", seed=7)
    assert s1.count() == 100
    assert s1.select("o_orderkey").exceptAll(s2.select("o_orderkey")).count() == 0
    # different seed → different sample
    s3 = exact_n_sample(o, 100, "o_orderkey", seed=8)
    assert s1.select("o_orderkey").exceptAll(s3.select("o_orderkey")).count() > 0


def test_stratified_quota_per_stratum(spark, sf_oracle):
    o = table(spark, sf_oracle, "orders")
    quotas = {"1-URGENT": 50, "5-LOW": 100, "3-MEDIUM": 25}
    s = stratified_sample(o, "o_orderpriority", quotas, "o_orderkey", seed=7)
    got = {r["o_orderpriority"]: r["n"] for r in s.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    assert got == quotas  # unlisted strata excluded (quota 0)


def test_stratified_gold_design(spark):
    """The reference's tiered gold sample: strata from similarity bands,
    fixed counts per tier (evaluate_ontology_alignment.py design)."""
    pairs = spark.range(2000).select(
        F.col("id").alias("pair_id"),
        ((F.col("id") % 100) / 100.0 + 0.005).alias("similarity"),
    )
    tiered = pairs.withColumn("tier", similarity_tiers(F.col("similarity")))
    gold = stratified_sample(
        tiered.filter(F.col("tier") != "below"),
        "tier",
        {"exact": 5, "high": 10, "mid": 10, "borderline": 5},
        "pair_id",
        seed=42,
    )
    got = {r["tier"]: r["n"] for r in gold.groupBy("tier").agg(F.count("*").alias("n")).collect()}
    assert got == {"exact": 5, "high": 10, "mid": 10, "borderline": 5}
    # every sampled pair respects its tier's similarity band
    bad = gold.filter(
        ((F.col("tier") == "exact") & (F.col("similarity") < 0.95))
        | ((F.col("tier") == "borderline") & (F.col("similarity") >= 0.75))
    ).count()
    assert bad == 0
