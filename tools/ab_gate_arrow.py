"""Interleaved A/B: quality-gate engine expr vs arrow (round-15 verdict #4).

llm_curation_funnel decomposed (r14 §H) to the interpreted-HOF floor —
``filter``/``zip_with`` lambdas are CodegenFallback and the dup-bigram
tree evaluates ``zip_with`` three times per row. The unmeasured option
was ONE Arrow-vectorized pandas UDF for the token-derived counts with
all ratio/rounding arithmetic left in JVM expressions
(textops._gate_counts_udf). This tool times the two funnel variants and
the two text_quality_gate variants interleaved (A/B/A/B) under the
bench session config, verifying result identity first.

Usage: python tools/ab_gate_arrow.py [sf_dir] [reps]
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
    from science_datalake_spark.operators import textops as T
    from science_datalake_spark.operators.curation import curate, curation_funnel
    from science_datalake_spark.session import (
        SCAN_OPEN_COST_BYTES,
        get_spark,
        suggest_aqe,
        suggest_shuffle_partitions,
    )

    parts = suggest_shuffle_partitions(sf_dir)
    spark = get_spark(
        "ab-gate-arrow",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
            "spark.sql.adaptive.enabled": suggest_aqe(sf_dir),
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    def funnel(engine: str):
        d = table(spark, sf_dir, "documents")
        eval_docs = d.filter(F.col("doc_id") % 25 == 0)
        corpus = d.filter(F.col("doc_id") % 25 != 0).select("doc_id", "text")
        curated = curate(
            corpus,
            "doc_id",
            "text",
            dedup_key=F.md5(F.substring("text", 1, 60)),
            eval_docs=eval_docs,
            fractions={"train": 0.90, "val": 0.05, "test": 0.05},
            u_expr=(F.col("split_cluster") % 20) / F.lit(20.0),
            engine=engine,
        )
        return curation_funnel(curated)

    def tqg(engine: str):
        d = table(spark, sf_dir, "documents")
        flagged = T.quality_gate_flags(d.select("doc_id", "text"), engine=engine)
        return (
            flagged.groupBy("quality_reject")
            .agg(
                F.count("*").alias("n_docs"),
                F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
                F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
                F.round(F.avg("dup_bigram_frac"), 4).alias("avg_dup_bigram"),
            )
            .orderBy(F.asc_nulls_last("quality_reject"))
        )

    builders = {
        "funnel_expr": lambda: funnel("expr"),
        "funnel_arrow": lambda: funnel("arrow"),
        "tqg_expr": lambda: tqg("expr"),
        "tqg_arrow": lambda: tqg("arrow"),
    }
    # identity
    fe = builders["funnel_expr"]().toPandas()
    fa = builders["funnel_arrow"]().toPandas()
    assert fe.equals(fa), "funnel variants differ!"
    te = builders["tqg_expr"]().toPandas()
    ta = builders["tqg_arrow"]().toPandas()
    assert te.equals(ta), "text_quality_gate variants differ!"
    print(f"# identity OK: funnel {len(fe)} rows, tqg {len(te)} rows", file=sys.stderr)

    out: dict[str, list[float]] = {k: [] for k in builders}
    for rep in range(reps):
        for name, mk in builders.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            mk().toPandas()
            out[name].append(round(time.perf_counter() - t0, 3))
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
