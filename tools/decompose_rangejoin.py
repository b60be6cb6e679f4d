"""Leg-level decomposition of join_range_overlap_spans (round-13 verdict
item #1): time each branch of interval_overlap_join in isolation on the
same inputs the driver query uses, so the 8-9 s absolute stops hiding
which leg pays for it.

Legs (the exact pair-space partition the operator builds):
  banded      short x short   (explode + equi join on keys+bucket)
  theta_LxA   long x ALL      (broadcast long build, hash join on keys)
  theta_SxL   short x long    (broadcast long build, hash join on keys)
plus:
  scan        one pass over the iv projection (count) — the per-leg scan tax
  keyed       strategy="keyed" whole query (the bounded-group reference plan)
  full        the shipped query end-to-end

Usage: python tools/decompose_rangejoin.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/sf3"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from science_datalake_spark.catalog import table
    from science_datalake_spark.operators.rangejoin import interval_overlap_join
    from science_datalake_spark.session import get_spark

    spark = get_spark("rangejoin-decompose")

    def iv():
        li = table(spark, sf_dir, "lineitem")
        base = F.datediff(
            F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date")
        ).cast("double")
        return li.select(
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

    W, LSB = 16.0, 64
    span_buckets = F.floor(F.col("end") / W).cast("long") - F.floor(
        F.col("start") / W
    ).cast("long")

    def agg(pairs):
        pairs = pairs.filter(F.col("uid") < F.col("uid_r"))
        return (
            pairs.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("l_suppkey")
        )

    def leg_banded():
        s = iv().filter(span_buckets < LSB)
        return agg(
            interval_overlap_join(
                s, s, bucket_width=W, on=["l_partkey", "l_suppkey"],
                long_span_buckets=None,
            )
        )

    def leg_theta_long_x_all():
        lng = iv().filter(span_buckets >= LSB)
        return agg(
            F.broadcast(lng.withColumnsRenamed(
                {"uid": "uid_r", "start": "start_r", "end": "end_r"}
            )).join(iv(), on=["l_partkey", "l_suppkey"])
            .filter(
                (F.col("start") <= F.col("end_r")) & (F.col("start_r") <= F.col("end"))
            )
        )

    def leg_theta_short_x_long():
        s = iv().filter(span_buckets < LSB)
        lng = iv().filter(span_buckets >= LSB)
        return agg(
            s.join(
                F.broadcast(lng.withColumnsRenamed(
                    {"uid": "uid_r", "start": "start_r", "end": "end_r"}
                )),
                on=["l_partkey", "l_suppkey"],
            ).filter(
                (F.col("start") <= F.col("end_r")) & (F.col("start_r") <= F.col("end"))
            )
        )

    def whole(strategy="banded", lsb=LSB, w=W):
        kw = dict(bucket_width=w, on=["l_partkey", "l_suppkey"])
        if strategy == "keyed":
            kw["strategy"] = "keyed"
        else:
            kw["long_span_buckets"] = lsb
        return agg(interval_overlap_join(iv(), iv(), **kw))

    def explode_agg(w=W):
        """the exploded band relation alone (forced through an agg that
        cannot skip Generate): isolates scan+explode cost from the join."""
        sb = F.floor(F.col("end") / w).cast("long") - F.floor(
            F.col("start") / w
        ).cast("long")
        s = iv().filter(sb < LSB)
        lb = s.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / w).cast("long"),
                    F.floor(F.col("end") / w).cast("long"),
                )
            ),
        )
        return lb.agg(F.sum("__bucket").alias("n"))

    def leg_banded_shj(width=None):
        """banded leg with a shuffle_hash hint: the exploded relations are
        40M rows a side — SMJ sorts both; SHJ hashes one. ``width``
        widens the exchanges first (expansion-aware rule): at 32
        partitions the per-partition build is 1.25M rows and the hash map
        OOMs an 8g heap; at 128+ it fits."""
        s = iv().filter(span_buckets < LSB)
        lb = s.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / W).cast("long"),
                    F.floor(F.col("end") / W).cast("long"),
                )
            ),
        )
        rb = lb.withColumnsRenamed(
            {"uid": "uid_r", "start": "start_r", "end": "end_r"}
        )
        first_common = F.greatest(
            F.floor(F.col("start") / W).cast("long"),
            F.floor(F.col("start_r") / W).cast("long"),
        )
        overlap = (F.col("start") <= F.col("end_r")) & (
            F.col("start_r") <= F.col("end")
        )
        keys = ["l_partkey", "l_suppkey", "__bucket"]
        if width:
            lb = lb.repartition(width, *keys)
            rb = rb.repartition(width, *keys)
        return agg(
            lb.join(rb.hint("shuffle_hash"), on=keys)
            .filter(overlap & (F.col("__bucket") == first_common))
            .drop("__bucket")
        )

    def full_shared(hint=None, mode="checkpoint", w=W, lsb=LSB):
        """whole query with ONE materialized iv scan feeding all legs."""
        if mode == "persist":
            from pyspark import StorageLevel

            base = iv().persist(StorageLevel.MEMORY_AND_DISK)
        else:
            base = iv().localCheckpoint(eager=False)
        sb = F.floor(F.col("end") / w).cast("long") - F.floor(
            F.col("start") / w
        ).cast("long")
        s = base.filter(sb < lsb)
        lng = base.filter(sb >= lsb)
        ren = {"uid": "uid_r", "start": "start_r", "end": "end_r"}
        overlap = (F.col("start") <= F.col("end_r")) & (
            F.col("start_r") <= F.col("end")
        )
        lb = s.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / w).cast("long"),
                    F.floor(F.col("end") / w).cast("long"),
                )
            ),
        )
        rb = lb.withColumnsRenamed(ren)
        keys = ["l_partkey", "l_suppkey", "__bucket"]
        if hint:
            lb = lb.repartition(128, *keys)
            rb = rb.repartition(128, *keys).hint(hint)
        first_common = F.greatest(
            F.floor(F.col("start") / w).cast("long"),
            F.floor(F.col("start_r") / w).cast("long"),
        )
        banded = (
            lb.join(rb, on=keys)
            .filter(overlap & (F.col("__bucket") == first_common))
            .drop("__bucket")
        )
        t1 = F.broadcast(lng).join(
            base.withColumnsRenamed(ren), on=["l_partkey", "l_suppkey"]
        ).filter(overlap)
        t2 = s.join(
            F.broadcast(lng.withColumnsRenamed(ren)), on=["l_partkey", "l_suppkey"]
        ).filter(overlap)
        return agg(banded.unionByName(t1).unionByName(t2))

    cases = {
        "scan": lambda: iv().agg(F.count(F.lit(1)).alias("n")),
        "banded": leg_banded,
        "banded_shj128": lambda: leg_banded_shj(128),
        "theta_LxA": leg_theta_long_x_all,
        "theta_SxL": leg_theta_short_x_long,
        "keyed": lambda: whole("keyed"),
        "full": lambda: whole(),
        "full_shared": lambda: full_shared(),
        "full_shared_shj": lambda: full_shared("shuffle_hash"),
        # W=64: fan-out 2.6 -> ~1.4 per interval; long threshold 64*16 =
        # 1024 days still routes the +5000-day rows through theta
        "full_w64": lambda: whole(lsb=16, w=64.0),
        "full_w128": lambda: whole(lsb=8, w=128.0),
        "full_w512": lambda: whole(lsb=2, w=512.0),
        "full_persist": lambda: full_shared(mode="persist"),
        "full_persist_w256": lambda: full_shared(mode="persist", w=256.0, lsb=4),
        "full_w256": lambda: whole(lsb=4, w=256.0),
        "explode_w16": lambda: explode_agg(16.0),
        "explode_w64": lambda: explode_agg(64.0),
    }
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    out = {}
    for name, fn in cases.items():
        if only and name not in only:
            continue
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            n = fn().count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 3), "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "legs": out}))


if __name__ == "__main__":
    main()
