"""Stage-level decomposition of dedup_cluster_sizes (round-14 follow-up):
the suite's largest Spark absolute at sf0.1 (4.1 s single, ~7 s in-suite)
over a MICROSCOPIC 4-source shard (~1k docs, ~2k star edges) — i.e. the
cost is Spark fixed job/scheduling floor, not data. Attribute it: minhash
signatures, star-edge build, the CC star loop (with round count), final
assembly. Warm best-of-N, bench session config, job counts per stage.

Usage: python tools/decompose_cluster_sizes.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from science_datalake_spark.catalog import table
    from science_datalake_spark.operators import dedup as D
    from science_datalake_spark.operators.graph import connected_components_star
    from science_datalake_spark.queries.llm_pipeline import (
        _CLUSTER_SOURCES,
        _LSH_MAX_BUCKET,
        _NUM_HASHES,
        dedup_cluster_sizes,
    )
    from science_datalake_spark.session import (
        SCAN_OPEN_COST_BYTES,
        get_spark,
        suggest_aqe,
        suggest_shuffle_partitions,
    )

    parts = suggest_shuffle_partitions(sf_dir)
    spark = get_spark(
        "cluster-sizes-decompose",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.sql.files.openCostInBytes": str(SCAN_OPEN_COST_BYTES),
            "spark.sql.adaptive.enabled": suggest_aqe(sf_dir),
        },
    )
    sc = spark.sparkContext

    def shard():
        return (
            table(spark, sf_dir, "documents")
            .filter(F.col("source").isin(*_CLUSTER_SOURCES))
            .select("doc_id", "text")
        )

    def sigs():
        return D.minhash_signatures(shard(), "doc_id", "text", n=3, num_hashes=_NUM_HASHES)

    def edges():
        return D.lsh_star_edges(
            sigs(), "doc_id", num_hashes=_NUM_HASHES, max_bucket=_LSH_MAX_BUCKET
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    stages = {
        "sigs": lambda: noop(sigs()),
        "edges": lambda: edges(),  # lsh_star_edges materializes internally
        "cc": lambda: noop(connected_components_star(edges(), "id_a", "id_b")),
        "full": lambda: dedup_cluster_sizes(spark, sf_dir).toPandas(),
    }

    for name, fn in stages.items():
        sc.setJobDescription(f"cluster_sizes decompose: {name}")
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
        print(f"{name:6s} best={best:6.3f}s jobs={jobs}")
        sc.setJobDescription(None)

    # graph shape facts for the record
    e = edges()
    n_edges = e.count()
    n_nodes = e.select(F.col("id_a").alias("n")).unionByName(
        e.select(F.col("id_b").alias("n"))
    ).distinct().count()
    print(f"edges={n_edges} nodes={n_nodes}")
    spark.stop()


if __name__ == "__main__":
    main()
