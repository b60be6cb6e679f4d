"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints one JSON line.

Methodology: each query is executed twice and the best time is reported
(warm measurement — the first execution pays one-time JVM codegen/class
loading that amortizes away in any real deployment; data is NOT cached, so
every run re-scans Parquet end-to-end). Timing covers plan + execution +
collect of the (small) result.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from science_datalake_spark.queries import load_all
    from science_datalake_spark.session import get_spark

    queries, _ = load_all()
    spark = get_spark("sds-bench")

    # warm the JVM + parquet footers with one tiny action
    try:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    except Exception as e:
        print(f"# bench warmup failed ({sf_dir}): {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as e:  # report failures but keep the line parseable
            timings[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
