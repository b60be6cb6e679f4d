"""CLI + guarded SQL surface — the engine's query entry points.

Re-expresses the reference's two surfaces:
- ``datalake_cli.py`` (status / views / query / shell) — same subcommands
  over ``spark.sql`` instead of a DuckDB connection.
- ``app.py``'s SQL guard: regex DDL/DML blocklist, must start with
  SELECT/WITH, auto-append LIMIT (app.py:33-37,204-218,229-230).

Usage: ``python -m science_datalake_spark.cli query "SELECT ..." --sf-dir …``
"""

from __future__ import annotations

import argparse
import re
import sys
import time

from pyspark.sql import SparkSession

DEFAULT_ROW_CAP = 5000

_BLOCKLIST = re.compile(
    r"\b(insert|update|delete|drop|create|alter|attach|detach|copy|export|import|"
    r"pragma|install|load|call|set|reset|grant|revoke|truncate|merge|vacuum)\b",
    re.IGNORECASE,
)
# only a TRAILING top-level LIMIT counts — a LIMIT inside a subquery must
# not disable the outer row cap
_LIMIT_RE = re.compile(r"\blimit\s+\d+\s*$", re.IGNORECASE)


class UnsafeSQLError(ValueError):
    pass


def guard_sql(sql: str, row_cap: int = DEFAULT_ROW_CAP) -> str:
    """Validate + cap a user query: read-only statements only, auto-LIMIT."""
    stripped = sql.strip().rstrip(";").strip()
    if not re.match(r"^(select|with)\b", stripped, re.IGNORECASE):
        raise UnsafeSQLError("only SELECT/WITH queries are allowed")
    if _BLOCKLIST.search(stripped):
        raise UnsafeSQLError("statement contains blocked keywords")
    if not _LIMIT_RE.search(stripped):
        stripped = f"{stripped} LIMIT {row_cap}"
    return stripped


def _bootstrap(sf_dir: str) -> SparkSession:
    from science_datalake_spark.catalog import bootstrap_session, register_views
    from science_datalake_spark.session import get_spark

    spark = bootstrap_session(get_spark("sds-cli"), sf_dir)
    register_views(spark, sf_dir)
    return spark


def cmd_status(args: argparse.Namespace) -> int:
    spark = _bootstrap(args.sf_dir)
    for name in sorted(t.name for t in spark.catalog.listTables()):
        n = spark.table(name).count()
        print(f"{name:24s} {n:>12,} rows")
    return 0


def cmd_views(args: argparse.Namespace) -> int:
    spark = _bootstrap(args.sf_dir)
    for t in sorted(spark.catalog.listTables(), key=lambda t: t.name):
        cols = ", ".join(f.name for f in spark.table(t.name).schema.fields)
        print(f"{t.name}: {cols}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    spark = _bootstrap(args.sf_dir)
    try:
        sql = guard_sql(args.sql, args.row_cap)
    except UnsafeSQLError as e:
        print(f"rejected: {e}", file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    df = spark.sql(sql)
    rows = df.collect()
    elapsed = time.perf_counter() - t0
    df.limit(0).show()  # header
    for r in rows[:50]:
        print(" | ".join(str(v) for v in r))
    if len(rows) > 50:
        print(f"... ({len(rows)} rows total)")
    print(f"-- {len(rows)} rows in {elapsed:.2f}s")
    return 0


def cmd_shell(args: argparse.Namespace) -> int:
    spark = _bootstrap(args.sf_dir)
    print("science-datalake-spark shell — .tables to list, .quit to exit")
    while True:
        try:
            line = input("sql> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line in {".quit", ".exit"}:
            break
        if line == ".tables":
            for t in sorted(t.name for t in spark.catalog.listTables()):
                print(t)
            continue
        try:
            spark.sql(guard_sql(line, args.row_cap)).show(50, truncate=80)
        except Exception as e:  # surface errors, keep the shell alive
            print(f"error: {e}", file=sys.stderr)
    return 0


def cmd_sparql(args: argparse.Namespace) -> int:
    """SPARQL over an ontology file — the reference's sparql_query.py CLI
    surface (scripts/sparql_query.py:89-143), backed by the DataFrame
    translator instead of an Oxigraph store. The triples source is a
    Turtle / N-Triples / RDF-XML file (dispatched on extension) or a
    Parquet triples table with (s, p, o, lang) columns."""
    from science_datalake_spark.session import get_spark
    from science_datalake_spark.sparql import (
        SparqlError,
        quads_to_triples_df,
        sparql_select,
        with_common_prefixes,
    )
    from science_datalake_spark.sources.ontology import (
        parse_ntriples,
        parse_rdf_xml,
        parse_turtle,
    )

    import os as _os

    from science_datalake_spark.sparql import read_triple_store

    spark = get_spark("sds-sparql")
    src = args.triples
    if src.endswith(".parquet") or (
        _os.path.isdir(src)
        and any(n == "_SUCCESS" or n.startswith("p=") for n in _os.listdir(src))
    ):
        # a flat parquet triples file OR a write_triple_store layout
        # (predicate-partitioned directories) — both come back (s,p,o,lang)
        triples = read_triple_store(spark, src)
    else:
        with open(src, encoding="utf-8") as fh:
            text = fh.read()
        if src.endswith((".nt", ".ntriples")):
            quads = parse_ntriples(text)
        elif src.endswith((".rdf", ".xml", ".owl")):
            quads = parse_rdf_xml(text)
        else:  # .ttl and everything else: Turtle (supersets N-Triples)
            quads = parse_turtle(text)
        triples = quads_to_triples_df(spark, quads)
    try:
        # reference convenience (sparql_query.py:32-56): queries with no
        # PREFIX of their own get the well-known block prepended
        rows = (
            sparql_select(triples, with_common_prefixes(args.query))
            .limit(args.row_cap)
            .collect()
        )
    except SparqlError as e:
        print(f"rejected: {e}", file=sys.stderr)
        return 2
    for r in rows:
        print(" | ".join("" if v is None else str(v) for v in r))
    print(f"-- {len(rows)} rows")
    return 0


def cmd_update(args: argparse.Namespace) -> int:
    """The reference's headline `update` lifecycle (datalake_cli.py
    cmd_update: download → convert → views → materialize) over local
    NDJSON snapshot directories — ingest is file-incremental (unchanged
    files skip via checkpoint), the materialization is count-verified,
    and the run ends with the sanity suite; non-zero exit on any failed
    check, like the reference's verification step."""
    from science_datalake_spark.pipeline import run_pipeline
    from science_datalake_spark.session import get_spark

    source_dirs = {
        name: path
        for name, path in (
            ("openalex", args.openalex),
            ("s2ag", args.s2ag),
            ("sciscinet", args.sciscinet),
            ("retractions", args.retractions),
            ("code_links", args.code_links),
            ("fulltext", args.fulltext),
        )
        if path is not None
    }
    spark = get_spark("sds-update")
    result = run_pipeline(spark, source_dirs, args.work_dir)
    for name, n in result.ingested_rows.items():
        print(f"{name}: {n} rows staged")
    print(f"unified_papers: {result.unified_rows} rows")
    if result.fulltext_rows:
        print(f"fulltext_papers: {result.fulltext_rows} rows")
    for check in result.sanity:
        print(f"sanity {'PASS' if check.passed else 'FAIL'}: {check.name} — {check.detail}")
    return 0 if result.ok else 3


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="science-datalake-spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--row-cap", type=int, default=DEFAULT_ROW_CAP)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("status").set_defaults(fn=cmd_status)
    sub.add_parser("views").set_defaults(fn=cmd_views)
    q = sub.add_parser("query")
    q.add_argument("sql")
    q.set_defaults(fn=cmd_query)
    sub.add_parser("shell").set_defaults(fn=cmd_shell)
    sp = sub.add_parser("sparql")
    sp.add_argument("triples", help="ontology file (.ttl/.nt/.rdf) or parquet triples")
    sp.add_argument("query", help="SPARQL SELECT (BGP + OPTIONAL/UNION/FILTER)")
    sp.set_defaults(fn=cmd_sparql)
    up = sub.add_parser("update")
    up.add_argument("--work-dir", required=True)
    up.add_argument("--openalex", required=True, help="NDJSON snapshot dir")
    up.add_argument("--s2ag", required=True)
    up.add_argument("--sciscinet", required=True)
    up.add_argument("--retractions")
    up.add_argument("--code-links", dest="code_links")
    up.add_argument("--fulltext")
    up.set_defaults(fn=cmd_update)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
