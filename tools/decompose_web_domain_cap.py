"""Stage-level decomposition of web_domain_cap (round-13 verdict item #1):
the query prints 17-47x vs a FLAT 0.07 s oracle leg at every scale while
Spark's own absolute barely scales (1.6-2.7 s sf0.1 -> sf3) — so the cost
is fixed per run, not per row, and nobody has profiled it since the
round-5 salted-threshold redesign. Time each cumulative stage warm
(best-of-N in one session) and count Spark jobs per stage so the fixed
part is attributable.

Stages (cumulative; each adds one piece of the shipped plan):
  scan        documents scan + URL synthesis, count only
  host        + url_host 4-regex chain (agg over hash so exprs evaluate)
  psl         + registrable_domain (full PSL probe battery)
  survivors   the salted rank scan alone (domain_cap step 1)
  threshold   + per-domain cap-th key (domain_cap step 2, one agg)
  cap_join    full domain_cap output materialized (step 3 broadcast join)
  full        the shipped driver query end-to-end (group + orderBy)

Usage: python tools/decompose_web_domain_cap.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from science_datalake_spark.catalog import table
    from science_datalake_spark.operators.web import (
        domain_cap,
        registrable_domain,
        url_host,
    )
    from science_datalake_spark.session import get_spark

    spark = get_spark("web-domain-cap-decompose")
    sc = spark.sparkContext

    def urls():
        d = table(spark, sf_dir, "documents")
        k = (F.col("doc_id") % 12).cast("string")
        i = (F.col("doc_id") % 4 + 1).cast("int")
        ident = F.col("doc_id").cast("string")
        pre = F.element_at(
            F.lit(["https://www.", "HTTP://", "", "https://cdn."]), i
        )
        site = F.when(
            i == 2, F.concat(F.lit("SITE"), k, F.lit(".COM"))
        ).otherwise(F.concat(F.lit("site"), k, F.lit(".com")))
        post = F.element_at(F.lit(["", "/", "?utm=x", "#frag"]), i)
        return d.select(
            "doc_id",
            F.concat(pre, site, F.lit("/page/"), ident, post).alias("url"),
        )

    def base():
        return urls().withColumn(
            "domain", registrable_domain(url_host(F.col("url")))
        )

    def survivors():
        from pyspark.sql import Window

        b = base()
        key = F.struct(F.col("doc_id"))
        salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(32))
        w1 = Window.partitionBy("domain", "__salt").orderBy("__k")
        return (
            b.select("domain", key.alias("__k"), salt.alias("__salt"))
            .withColumn("__lrank", F.row_number().over(w1))
            .filter(F.col("__lrank") <= F.lit(5))
        )

    def threshold():
        return survivors().groupBy("domain").agg(
            F.count(F.lit(1)).alias("__n_surv"),
            F.get(F.sort_array(F.collect_list("__k")), 4).alias("__thr"),
        )

    stages = {
        "scan": lambda: urls().count(),
        "host": lambda: urls()
        .select(F.xxhash64(url_host(F.col("url"))).alias("h"))
        .agg(F.sum("h"))
        .collect(),
        "psl": lambda: base()
        .select(F.xxhash64("domain").alias("h"))
        .agg(F.sum("h"))
        .collect(),
        "survivors": lambda: survivors().count(),
        "threshold": lambda: threshold().count(),
        "cap_join": lambda: domain_cap(
            urls(), "url", max_per_domain=5, order_cols=["doc_id"]
        )
        .select(F.xxhash64("domain", "domain_kept").alias("h"))
        .agg(F.sum("h"))
        .collect(),
        "full": lambda: domain_cap(
            urls(), "url", max_per_domain=5, order_cols=["doc_id"]
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("domain_kept"), 1)).alias("n_kept"),
        )
        .orderBy("domain")
        .collect(),
    }

    # warmup: run the full query once so codegen/JIT is hot before timing
    stages["full"]()

    out = {}
    for name, fn in stages.items():
        best, jobs_at_best = None, None
        group = f"decomp-{name}"
        for _ in range(reps):
            # getJobIdsForGroup is CUMULATIVE over the session, so the
            # per-rep job count is the delta against a pre-rep snapshot
            # (review finding: without this, rep k reported k*jobs)
            j0 = len(sc.statusTracker().getJobIdsForGroup(group) or [])
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(group) or []) - j0
            sc.setJobGroup(None, None)
            if best is None or dt < best:
                best, jobs_at_best = dt, jobs
        out[name] = {"sec": round(best, 3), "jobs": jobs_at_best}
        print(f"{name:10s} {best:7.3f} s  jobs={jobs_at_best}", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "stages": out}))


if __name__ == "__main__":
    main()
