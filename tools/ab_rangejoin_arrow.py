"""Interleaved A/B: join_range_overlap_spans banded vs grouped_arrow.

Round-15 verdict item #1: retry the grouped pair enumeration inside ONE
Arrow mapInArrow stage (numpy shares the group's interval arrays across
emitted pairs — the per-pair array copy that sank the JVM grouped
strategy does not exist there), oversized groups still routed to banded.

Runs the full declared query (same aggregation, same toPandas fetch the
bench uses) under the exact bench session config, alternating variants
A/B/A/B per rep so co-tenant drift hits both equally. Also verifies the
two variants' SORTED result rows are identical before timing.

Usage: python tools/ab_rangejoin_arrow.py [sf_dir] [reps]
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
    from science_datalake_spark.operators.rangejoin import interval_overlap_join
    from science_datalake_spark.session import (
        SCAN_OPEN_COST_BYTES,
        get_spark,
        suggest_aqe,
        suggest_shuffle_partitions,
    )

    parts = suggest_shuffle_partitions(sf_dir)
    spark = get_spark(
        "ab-rangejoin-arrow",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
            "spark.sql.adaptive.enabled": suggest_aqe(sf_dir),
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    def build(strategy: str, **extra):
        li = table(spark, sf_dir, "lineitem")
        base = F.datediff(
            F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date")
        ).cast("double")
        iv = li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("uid"),
            "l_partkey",
            "l_suppkey",
            base.alias("start"),
            (
                base
                + F.col("l_quantity")
                + F.when(F.col("l_orderkey") % 1009 == 0, F.lit(5000.0)).otherwise(0.0)
            ).alias("end"),
        )
        kw = dict(
            bucket_width=256.0,
            on=["l_partkey", "l_suppkey"],
            long_span_buckets=4,
            share_scan=True,
        )
        if strategy != "banded":
            kw["strategy"] = strategy
        kw.update(extra)
        pairs = interval_overlap_join(iv, iv, **kw).filter(
            F.col("uid") < F.col("uid_r")
        )
        is_long = (F.col("end") - F.col("start") >= 1000) | (
            F.col("end_r") - F.col("start_r") >= 1000
        )
        return (
            pairs.groupBy("l_suppkey")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.when(is_long, 1).otherwise(0)).alias("n_long_pairs"),
                F.round(
                    F.avg(
                        F.least("end", "end_r") - F.greatest("start", "start_r")
                    ),
                    2,
                ).alias("avg_overlap_days"),
            )
            .orderBy("l_suppkey")
        )

    variants = {
        "banded": lambda: build("banded"),
        "banded_shj": lambda: build("banded", banded_join="shuffle_hash"),
        "grouped_arrow": lambda: build("grouped_arrow"),
        "grouped_arrow_nocap": lambda: build(
            "grouped_arrow", grouped_max_size=None
        ),
    }
    # row-identity first (cheap at any SF: output is per-supplier)
    a_rows = build("banded").toPandas()
    for name, mk in variants.items():
        b_rows = mk().toPandas()
        assert a_rows.equals(b_rows), f"variant {name} results differ!"
    print(f"# identity OK: {len(a_rows)} rows", file=sys.stderr)

    out: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for strat, mk in variants.items():
            spark.sparkContext.setJobDescription(f"spans {strat} rep{rep}")
            t0 = time.perf_counter()
            mk().toPandas()
            out[strat].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "parts": parts,
                "reps": out,
                "best": {k: min(v) for k, v in out.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
