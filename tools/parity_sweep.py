"""Value-parity sweep at an arbitrary scale factor.

Runs EVERY registered query (driver + aux) against its DuckDB oracle on
the given fixture directory with the same canonicalized compare the
local parity suite uses (`oracle.check_parity`: row count, sorted column
names, canonicalized values) and prints one JSON summary line.

The per-round pytest gate pins sf0.01; this tool exists for the LARGER
fixtures (`tools/gen_scale_fixture.py` output), where a sweep doubles as
scale-correctness evidence — the round-6 sf0.1 sweep caught a
global-window bug the sf0.01 gate missed, and the round-7 sf1 sweep is
the same check at 10x. Timing is NOT measured here (bench.py owns that);
load on the box does not invalidate a parity result.

Usage:
    python tools/parity_sweep.py /root/repo/.fixtures/sf1 [--timeout SECS]

--timeout interrupts a single slow ORACLE (DuckDB side) and records the
query as "skipped_timeout" instead of failing the sweep; 0 = no limit.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--timeout", type=float, default=0.0)
    args = ap.parse_args()

    from science_datalake_spark.oracle import check_parity, duckdb_connection
    from science_datalake_spark.queries import load_all, load_aux
    from science_datalake_spark.session import get_spark

    queries, oracle = load_all()
    aux_q, aux_o = load_aux()
    queries.update(aux_q)
    oracle.update(aux_o)

    spark = get_spark("parity-sweep")
    con = duckdb_connection(args.sf_dir)

    ok: list[str] = []
    rows_only: list[str] = []
    timeouts: list[str] = []
    failures: dict[str, str] = {}
    for name in sorted(queries):
        try:
            if name not in oracle:
                n = queries[name](spark, args.sf_dir).count()
                assert n >= 0
                rows_only.append(name)
                print(f"# {name}: rows-only ({n} rows)", file=sys.stderr)
                continue
            timer = None
            if args.timeout > 0:
                timer = threading.Timer(args.timeout, con.interrupt)
                timer.start()
            try:
                res = check_parity(
                    name, queries[name](spark, args.sf_dir), con, oracle[name]
                )
            finally:
                if timer is not None:
                    timer.cancel()
            if res.ok:
                ok.append(name)
                print(f"# {name}: OK ({res.spark_rows} rows)", file=sys.stderr)
            else:
                failures[name] = "; ".join(res.mismatches)[:500]
                print(f"# {name}: FAIL {failures[name]}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — sweep must visit every query
            if "INTERRUPT" in str(e).upper():
                timeouts.append(name)
                print(f"# {name}: oracle timeout", file=sys.stderr)
            else:
                failures[name] = str(e)[:500]
                print(f"# {name}: ERROR {failures[name]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "total": len(queries),
                "ok": len(ok),
                "rows_only": rows_only,
                "skipped_timeout": timeouts,
                "failures": failures,
            },
            sort_keys=True,
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
