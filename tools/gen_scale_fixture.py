"""Generate a larger-SF fixture from the driver's sf0.1 testdata.

The round-6 verdict's gate item: the bench 2x argument rests on a
plan-compile-floor decomposition measured at sf0.1; converting it into
evidence needs the same suite run at a scale factor where data work
dominates. The driver only ships sf<=0.1, so this tool scales sf0.1 up
by an integer factor K (sf1 = K=10) into a local fixture directory with
the SAME schema and single-file-parquet layout the driver uses.

Construction (deterministic, no RNG): K copies of every fact table with
per-copy key striding so referential integrity holds copy-internally
(copy k's orders reference copy k's customers, etc.), and per-copy
perturbation where exact duplication would distort a workload:

- customer/part/supplier names get a ``-k`` suffix (copy k>0) so
  name-grouped results keep per-entity granularity;
- documents get one extra ``dupK`` tail token (and recomputed n_chars)
  so exact-dedup does not collapse the corpus to 1/K while the near-dup
  family still sees K-sized near-duplicate clusters — the realistic
  shape for a crawl scaled 10x;
- embeddings are shifted by k*1e-3 per dimension so vectors are near-
  but not exact duplicates.

region/nation stay fixed (TPC-H dimension semantics). Timestamps stay
fixed: K-times denser events in the same windows, K-times more orders
per date — aggregate group counts stay constant while group sizes scale,
which is exactly the "same query, more data" shape the bench needs.

Usage:  python tools/gen_scale_fixture.py [K] [out_dir]
        (defaults: K=10, out_dir=.fixtures/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# key strides: clean powers of ten above every sf0.1 max key
STRIDE = {
    "custkey": 1_000_000,
    "orderkey": 10_000_000,
    "partkey": 1_000_000,
    "suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _sql(table: str, k: int) -> str:
    s = {n: v * k for n, v in STRIDE.items()}
    suffix = f" || '-{k}'" if k else ""
    src = f"read_parquet('{SRC}/{table}.parquet')"
    if table == "customer":
        return f"""SELECT c_custkey + {s['custkey']} AS c_custkey,
            c_name{suffix} AS c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src}"""
    if table == "supplier":
        return f"""SELECT s_suppkey + {s['suppkey']} AS s_suppkey,
            s_name{suffix} AS s_name, s_nationkey, s_acctbal FROM {src}"""
    if table == "part":
        return f"""SELECT p_partkey + {s['partkey']} AS p_partkey,
            p_name{suffix} AS p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src}"""
    if table == "orders":
        return f"""SELECT o_orderkey + {s['orderkey']} AS o_orderkey,
            o_custkey + {s['custkey']} AS o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority FROM {src}"""
    if table == "lineitem":
        return f"""SELECT l_orderkey + {s['orderkey']} AS l_orderkey,
            l_partkey + {s['partkey']} AS l_partkey,
            l_suppkey + {s['suppkey']} AS l_suppkey, l_linenumber,
            l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate FROM {src}"""
    if table == "events":
        return f"""SELECT event_id + {s['event_id']} AS event_id, ts,
            user_id + {s['user_id']} AS user_id, event_type, value, props
            FROM {src}"""
    if table == "documents":
        tail = f" || ' dup{k}'" if k else ""
        return f"""SELECT doc_id + {s['doc_id']} AS doc_id,
            text{tail} AS text, lang, source,
            length(text{tail}) AS n_chars FROM {src}"""
    if table == "embeddings":
        shift = k * 1e-3
        return f"""SELECT vec_id + {s['vec_id']} AS vec_id,
            list_transform(embedding, x -> CAST(x + {shift} AS FLOAT))
                AS embedding,
            label FROM {src}"""
    raise ValueError(table)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".fixtures/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")
    for table in (
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        union = " UNION ALL ".join(_sql(table, k) for k in range(factor))
        # Small row groups for the heavy-per-row tables: a single-row-group
        # file caps BOTH engines at one scan task (Spark assigns a row
        # group to the byte-range split holding its midpoint; DuckDB
        # parallelizes per row group). 4096-row groups give documents ~12
        # groups at sf1 / ~37 at sf3 and embeddings ~5/~15 — enough splits
        # to keep 32 cores busy once maxPartitionBytes is sized to match
        # (session.suggest_max_partition_bytes). Fact tables exceed the
        # 122,880-row DuckDB default anyway and stay default.
        rgs = {"documents": ", ROW_GROUP_SIZE 2048", "embeddings": ", ROW_GROUP_SIZE 1024"}.get(table, "")
        con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET{rgs})")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")
    con.close()


if __name__ == "__main__":
    main()
