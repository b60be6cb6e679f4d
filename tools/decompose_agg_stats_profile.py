"""Stage-level decomposition of agg_stats_profile (round-14 follow-up):
the idle-box single prints ~2.0 s at sf0.1 against a 0.10-0.12 s oracle
leg, above the 1.31 s the §D adoption A/B recorded. Time each cumulative
stage warm (best-of-N in one session, bench session config) and count
Spark jobs per stage so the fixed part is attributable.

Stages (each materialized with the noop sink so the computation is timed,
not the fetch — guide §1.4; `full` additionally reports the toPandas
variant the bench times):
  scan        lineitem scan, the 4 used columns projected
  plain       algebraic agg leg alone (count/avg/min/max/sum/2x corr)
  hist        (group, value) histogram build alone
  quant       histogram -> percentile() quantile leg
  join        plain + broadcast(quant) left join + final projection
  full        the shipped driver query end-to-end incl. orderBy
  full_fetch  same, timed through toPandas like bench.py

Usage: python tools/decompose_agg_stats_profile.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from science_datalake_spark.catalog import table
    from science_datalake_spark.operators.stats import (
        _value_histogram,
        exact_group_quantiles_percentile,
    )
    from science_datalake_spark.queries.analytics import agg_stats_profile
    from science_datalake_spark.session import (
        SCAN_OPEN_COST_BYTES,
        get_spark,
        suggest_aqe,
        suggest_shuffle_partitions,
    )

    parts = suggest_shuffle_partitions(sf_dir)
    spark = get_spark(
        "agg-stats-decompose",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
            "spark.sql.adaptive.enabled": suggest_aqe(sf_dir),
        },
    )
    sc = spark.sparkContext

    li = table(spark, sf_dir, "lineitem")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def plain_df():
        return li.groupBy("l_returnflag").agg(
            F.count("*").alias("n"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("c1"),
            F.round(F.corr("l_discount", "l_tax"), 6).alias("c2"),
        )

    def quant_df():
        return exact_group_quantiles_percentile(
            li,
            ["l_returnflag"],
            "l_extendedprice",
            quantiles=(0.25, 0.5, 0.75, 0.95),
            out_names=("q25", "q50", "q75", "q95"),
        )

    stages = {
        "scan": lambda: noop(
            li.select("l_returnflag", "l_extendedprice", "l_quantity", "l_discount", "l_tax")
        ),
        "plain": lambda: noop(plain_df()),
        "hist": lambda: noop(_value_histogram(li, ["l_returnflag"], "l_extendedprice")),
        "quant": lambda: noop(quant_df()),
        "join": lambda: noop(
            plain_df().join(F.broadcast(quant_df()), "l_returnflag", "left")
        ),
        "full": lambda: noop(agg_stats_profile(spark, sf_dir)),
        "full_fetch": lambda: agg_stats_profile(spark, sf_dir).toPandas(),
    }

    for name, fn in stages.items():
        sc.setJobDescription(f"agg_stats_profile decompose: {name}")
        best = float("inf")
        jobs = None
        for _ in range(reps):
            j0 = sc.statusTracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            j1 = sc.statusTracker().getJobIdsForGroup(None)
            if dt < best:
                best = dt
                jobs = len(set(j1) - set(j0))
        print(f"{name:12s} best={best:6.3f}s jobs={jobs}")
        sc.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
