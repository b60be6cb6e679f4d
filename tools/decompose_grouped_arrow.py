"""Stage-level decomposition of the grouped_arrow spans leg (round 15).

Times, each with a noop sink under the bench session config:
  scan        one pass over the persisted iv projection
  gate        exchange + window count + small-filter (no Python)
  sortonly    exchange + sortWithinPartitions (the cap=None shape)
  enum_win    gate + mapInArrow enumeration (pairs discarded by noop)
  enum_sort   sortonly + mapInArrow enumeration, grouped_max_size=None
  enum_batchK enum_sort with maxRecordsPerBatch=65536
  banded_leg  the banded short×short engine on the same input
  full_*      the whole declared query per variant

Usage: python tools/decompose_grouped_arrow.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/sf3"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark import StorageLevel

    from science_datalake_spark.catalog import table
    from science_datalake_spark.operators.rangejoin import (
        _bucket,
        _grouped_arrow_fn,
    )
    from science_datalake_spark.session import (
        SCAN_OPEN_COST_BYTES,
        get_spark,
        suggest_aqe,
        suggest_shuffle_partitions,
    )

    parts = suggest_shuffle_partitions(sf_dir)
    spark = get_spark(
        "decompose-grouped-arrow",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
            "spark.sql.adaptive.enabled": suggest_aqe(sf_dir),
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

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
    ).persist(StorageLevel.MEMORY_AND_DISK)
    iv.count()  # materialize once, outside every timed region

    W, LSB, CAP = 256.0, 4, 4096
    on = ["l_partkey", "l_suppkey"]
    span_buckets = _bucket(F.col("end"), W) - _bucket(F.col("start"), W)
    short = iv.filter(span_buckets < LSB)
    nn = short
    for k in on:
        nn = nn.filter(F.col(k).isNotNull())

    l_items = ["uid", "start", "end"]
    r_items = ["uid_r", "start_r", "end_r"]
    from pyspark.sql.types import StructField, StructType

    fields = [StructField(k, iv.schema[k].dataType, True) for k in on]
    fields += [StructField(c, iv.schema[c].dataType, True) for c in l_items]
    fields += [
        StructField(rn, iv.schema[c].dataType, True)
        for rn, c in zip(r_items, l_items)
    ]
    schema = StructType(fields)
    fn = _grouped_arrow_fn(
        on, l_items, r_items, "start", "end", "start_r", "end_r", True
    )

    def gate_df():
        w = Window.partitionBy(*on)
        sized = nn.withColumn("__gsz", F.count(F.lit(1)).over(w))
        return sized.filter(F.col("__gsz") <= CAP).drop("__gsz")

    def sort_df():
        return nn.repartition(*on).sortWithinPartitions(*on)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "scan": lambda: noop(nn),
        "gate": lambda: noop(gate_df()),
        "sortonly": lambda: noop(sort_df()),
        "enum_win": lambda: noop(gate_df().mapInArrow(fn, schema)),
        "enum_sort": lambda: noop(sort_df().mapInArrow(fn, schema)),
    }

    def banded_leg():
        lb = nn.withColumn(
            "__bucket",
            F.explode(F.sequence(_bucket(F.col("start"), W), _bucket(F.col("end"), W))),
        )
        rb = (
            nn.select(
                *on,
                F.col("uid").alias("uid_r"),
                F.col("start").alias("start_r"),
                F.col("end").alias("end_r"),
            )
            .withColumn(
                "__bucket",
                F.explode(
                    F.sequence(
                        _bucket(F.col("start_r"), W), _bucket(F.col("end_r"), W)
                    )
                ),
            )
        )
        overlap = (F.col("start") <= F.col("end_r")) & (
            F.col("start_r") <= F.col("end")
        )
        first_common = F.greatest(
            _bucket(F.col("start"), W), _bucket(F.col("start_r"), W)
        )
        return (
            lb.join(rb, on=[*on, "__bucket"])
            .filter(overlap & (F.col("__bucket") == first_common))
            .drop("__bucket")
        )

    variants["banded_leg"] = lambda: noop(banded_leg())

    out: dict[str, list[float]] = {k: [] for k in variants}
    batch_reps: dict[str, list[float]] = {"enum_sort_b64k": [], "enum_sort_b2k": []}
    for rep in range(reps):
        for name, run in variants.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            run()
            out[name].append(round(time.perf_counter() - t0, 3))
        for label, nrec in (("enum_sort_b64k", 65536), ("enum_sort_b2k", 2048)):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(nrec))
            spark.sparkContext.setJobDescription(f"{label} rep{rep}")
            t0 = time.perf_counter()
            noop(sort_df().mapInArrow(fn, schema))
            batch_reps[label].append(round(time.perf_counter() - t0, 3))
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.sparkContext.setJobDescription(None)
    out.update(batch_reps)
    print(json.dumps({"sf_dir": sf_dir, "parts": parts,
                      "best": {k: min(v) for k, v in out.items()},
                      "reps": out}))


if __name__ == "__main__":
    main()
