"""Sketch operators: HLL estimates within rsd tolerance of exact,
lossless sketch rollup (merge == sketch-of-union), CMS one-sided error
bounds, and heavy-hitter exactness on planted skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from science_datalake_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    heavy_hitters,
    hll_distinct,
    hll_rollup,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 20_000 rows over 4 "days"; value cardinality differs per day and
    # two planted heavy values dominate
    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("day"),
        F.when(F.col("id") % 5 < 2, F.lit(7))  # 40% of rows are value 7
        .when(F.col("id") % 5 == 2, F.lit(13))  # 20% are value 13
        .otherwise(F.col("id") % 997)
        .alias("v"),
    )
    return df.cache()


def test_hll_estimates_within_tolerance(spark, skewed):
    exact = {
        r["day"]: r["n"]
        for r in skewed.groupBy("day")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    got = {
        r["day"]: r["approx_distinct"]
        for r in hll_distinct(skewed, ["day"], "v").collect()
    }
    assert set(got) == set(exact)
    for day, est in got.items():
        # lgk=12 -> rsd ~1.6%; allow 5% (3 sigma) plus small-count slack
        assert abs(est - exact[day]) <= max(0.05 * exact[day], 3), (
            day,
            est,
            exact[day],
        )


def test_hll_rollup_is_lossless_merge(spark, skewed):
    daily = hll_distinct(skewed, ["day"], "v")
    merged = hll_rollup(daily, [], "sketch").first()["approx_distinct"]
    direct = hll_distinct(skewed.withColumn("g", F.lit(1)), ["g"], "v").first()[
        "approx_distinct"
    ]
    # union of sketches IS the sketch of the union — identical estimate,
    # not merely close
    assert merged == direct


def test_cms_one_sided_error(spark, skewed):
    total = skewed.count()
    eps = 0.001
    sk = cms_build(skewed, "v", eps=eps, confidence=0.99)
    truth = {
        r["v"]: r["n"]
        for r in skewed.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = [7, 13, 101, 500, 996]
    est = cms_estimate(spark, sk, probes)
    for item in probes:
        t = truth.get(item, 0)
        assert est[item] >= t, "CMS must never undercount"
        assert est[item] <= t + eps * total + 1


def test_heavy_hitters_finds_planted_values(spark, skewed):
    hh = heavy_hitters(skewed, "v", support=0.1)
    rows = hh.collect()
    assert [r["item"] for r in rows] == [7, 13]
    truth = {
        r["v"]: r["n"]
        for r in skewed.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n"] == truth[r["item"]]  # exact, not estimated
        assert r["frac"] == pytest.approx(r["n"] / 20_000)


def test_heavy_hitters_validation_and_empty(spark, skewed):
    with pytest.raises(ValueError, match="support"):
        heavy_hitters(skewed, "v", support=0.0)
    empty = skewed.filter(F.lit(False))
    assert heavy_hitters(empty, "v", support=0.5).collect() == []
