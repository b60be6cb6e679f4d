"""join_cooccurrence count-shuffle A/B (round-15 verdict #5).

The packed pair stream currently crosses the count exchange UN-combined
(an explicit repartition before groupBy trades away map-side partial
aggregation — adopted in r12 because the input-sized reducer rule
undersized the expanded stage). This tool measures:

  multiplicity   total pair rows vs distinct pairs (how much a partial
                 aggregate could shrink the exchange)
  repart         current shape: repartition(N, __pk) + groupBy
  partial        groupBy(__pk) directly (partial_count before the
                 exchange), shuffle width = session setting
  partial_wide   groupBy(__pk) with shuffle.partitions raised to the
                 cooccurrence N for the build (the r12 width lesson,
                 kept WITH partial aggregation)

All variants run the full declared query (top-20 fetch). Identity is
checked against the current shape first.

Usage: python tools/ab_cooccurrence_partial.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/sf3"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from science_datalake_spark.catalog import table
    from science_datalake_spark.session import (
        SCAN_OPEN_COST_BYTES,
        get_spark,
        suggest_aqe,
        suggest_shuffle_partitions,
    )

    parts = suggest_shuffle_partitions(sf_dir)
    spark = get_spark(
        "ab-cooc",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
            "spark.sql.adaptive.enabled": suggest_aqe(sf_dir),
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    ncoop = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )

    def pairs_df():
        li = table(spark, sf_dir, "lineitem")
        grouped = (
            li.repartition(ncoop, "l_orderkey")
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("__items"))
        )
        exploded = grouped.select(
            F.col("__items"), F.posexplode("__items").alias("__i", "item_a")
        )
        later = F.expr("slice(__items, __i + 2, size(__items) - __i - 1)")
        pr = exploded.select(F.col("item_a"), F.explode(later).alias("item_b"))
        return pr.select(
            F.shiftleft(F.col("item_a").cast("bigint"), 32)
            .bitwiseOR(F.col("item_b").cast("bigint"))
            .alias("__pk")
        )

    def finish(cnt):
        top = cnt.filter(F.col("n_shared") >= 2).select(
            F.shiftright(F.col("__pk"), 32).alias("item_a"),
            F.col("__pk").bitwiseAND(F.lit(0x7FFFFFFF)).alias("item_b"),
            "n_shared",
        )
        return top.orderBy(F.desc("n_shared"), "item_a", "item_b").limit(20)

    def repart():
        pk = pairs_df()
        return finish(
            pk.repartition(ncoop, "__pk").groupBy("__pk").agg(
                F.count("*").alias("n_shared")
            )
        )

    def partial():
        return finish(
            pairs_df().groupBy("__pk").agg(F.count("*").alias("n_shared"))
        )

    def partial_wide():
        spark.conf.set("spark.sql.shuffle.partitions", str(ncoop))
        try:
            return finish(
                pairs_df().groupBy("__pk").agg(F.count("*").alias("n_shared"))
            )
        finally:
            pass  # reset AFTER the action in the timing loop

    # multiplicity probe (one pass each, not timed precisely)
    pk = pairs_df()
    total = pk.count()
    distinct = pk.distinct().count()
    print(
        f"# pair rows: total={total} distinct={distinct} "
        f"multiplicity={total / max(distinct, 1):.3f}",
        file=sys.stderr,
    )

    a = repart().toPandas()
    for mk in (partial,):
        b = mk().toPandas()
        assert a.equals(b), "variant differs!"
    print("# identity OK", file=sys.stderr)

    out: dict[str, list[float]] = {"repart": [], "partial": [], "partial_wide": []}
    for rep in range(reps):
        for name in out:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.sparkContext.setJobDescription(f"cooc {name} rep{rep}")
            if name == "partial_wide":
                spark.conf.set("spark.sql.shuffle.partitions", str(ncoop))
                df = pairs_df().groupBy("__pk").agg(F.count("*").alias("n_shared"))
                df = finish(df)
            elif name == "partial":
                df = partial()
            else:
                df = repart()
            t0 = time.perf_counter()
            df.toPandas()
            out[name].append(round(time.perf_counter() - t0, 3))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "parts": parts,
                "ncoop": ncoop,
                "multiplicity": round(total / max(distinct, 1), 3),
                "reps": out,
                "best": {k: min(v) for k, v in out.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
