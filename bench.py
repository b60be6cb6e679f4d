"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints one JSON line.

Timing = full query execution to collect-count (results are small top-k /
agg outputs, so collection cost is negligible vs execution).
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
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            timings[name] = round(time.perf_counter() - t0, 3)
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
