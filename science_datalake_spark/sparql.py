"""SPARQL basic-graph-pattern → DataFrame mini-translator (SURVEY §7.3's
"if needed later" — the last uncovered reference surface).

The reference loads ontology triples into Oxigraph for SPARQL access;
SURVEY §7.3 defers a triple store because the Parquet 3-table model
carries the same content. This module closes the remaining gap for the
QUERY side: a SPARQL subset is translated into Catalyst plans over a
plain ``(s, p, o, lang)`` triples DataFrame, so hierarchy/label questions
written as SPARQL run distributed, with predicate filters pushed into the
Parquet scan like any other DataFrame filter.

Supported subset (the BGP core):
- ``PREFIX pfx: <iri>`` declarations
- ``SELECT ?a ?b`` / ``SELECT DISTINCT ?a`` / ``SELECT *``
- ``WHERE { t1 . t2 . ... }`` with triple patterns of IRIs
  (``<...>``/``pfx:local``/``a``), literals (``"..."``/``"..."@lang``),
  and ``?variables``; ``;``-predicate-object lists
- ``LIMIT n``
No OPTIONAL / UNION / FILTER expressions / property paths — those are the
cue to materialize a view with the DataFrame API instead.

Translation: each triple pattern becomes a filtered projection of the
triples relation (constants → pushed filters, variables → renamed
columns, repeated variables inside one pattern → equality filters);
patterns join pairwise on their shared variables (hash joins on variable
columns; patterns sharing none cross-join, which is correct BGP
semantics). A constant-predicate pattern therefore scans only its
predicate's row group range once triples are stored predicate-sorted —
the classic vertical-partitioning RDF layout falls out of
``write_parquet_partitioned(partition_cols=["p"])``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from science_datalake_spark.util import local_df

TRIPLES_SCHEMA = "s STRING, p STRING, o STRING, lang STRING"

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def quads_to_triples_df(spark: SparkSession, quads: list[tuple]) -> DataFrame:
    """Parser quads (sources/ontology.py) → the queryable triples relation."""
    return local_df(spark, [tuple(q) for q in quads], TRIPLES_SCHEMA)


@dataclass(frozen=True)
class _Term:
    kind: str  # "var" | "iri" | "lit"
    value: str
    lang: str | None = None


_TOKEN = re.compile(
    r"""
    (?P<iriref><[^<>\s]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")(?:@(?P<lang>[a-zA-Z-]+))?
  | (?P<var>\?[A-Za-z_][\w]*)
  | (?P<punct>[{}.;])
  | (?P<word>[^\s{}.;]+)
  | (?P<ws>\s+)
    """,
    re.X,
)


class SparqlError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str, str | None]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            raise SparqlError(f"cannot tokenize at: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup if m.lastgroup != "lang" else "string"
        if kind == "ws":
            continue
        out.append((kind, m.group(kind), m.group("lang") if kind == "string" else None))
    return out


def _parse(query: str):
    toks = _tokenize(query)
    i = 0
    prefixes: dict[str, str] = {}
    # PREFIX declarations
    while i < len(toks) and toks[i][1].upper() == "PREFIX":
        pfx, iri = toks[i + 1][1], toks[i + 2][1]
        if not pfx.endswith(":") or not iri.startswith("<"):
            raise SparqlError(f"malformed PREFIX near {pfx} {iri}")
        prefixes[pfx[:-1]] = iri[1:-1]
        i += 3
    if i >= len(toks) or toks[i][1].upper() != "SELECT":
        raise SparqlError("expected SELECT")
    i += 1
    distinct = i < len(toks) and toks[i][1].upper() == "DISTINCT"
    if distinct:
        i += 1
    select_vars: list[str] = []
    star = False
    while i < len(toks) and toks[i][1].upper() != "WHERE":
        kind, val, _ = toks[i]
        if val == "*":
            star = True
        elif kind == "var":
            select_vars.append(val[1:])
        else:
            raise SparqlError(f"unexpected token in SELECT list: {val!r}")
        i += 1
    if i >= len(toks):
        raise SparqlError("expected WHERE")
    i += 1  # WHERE
    if toks[i][1] != "{":
        raise SparqlError("expected '{' after WHERE")
    i += 1

    def term(tok: tuple[str, str, str | None]) -> _Term:
        kind, val, lang = tok
        if kind == "var":
            return _Term("var", val[1:])
        if kind == "iriref":
            return _Term("iri", val[1:-1])
        if kind == "string":
            return _Term("lit", val[1:-1].replace('\\"', '"'), lang)
        if kind == "word":
            if val == "a":
                return _Term("iri", _RDF_TYPE)
            pfx, sep, local = val.partition(":")
            if sep and pfx in prefixes:
                return _Term("iri", prefixes[pfx] + local)
            raise SparqlError(f"unknown prefix or bare word: {val!r}")
        raise SparqlError(f"unexpected term: {val!r}")

    patterns: list[tuple[_Term, _Term, _Term]] = []
    subj: _Term | None = None
    while i < len(toks) and toks[i][1] != "}":
        if toks[i][1] == ".":
            subj = None
            i += 1
            continue
        if toks[i][1] == ";":
            if subj is None:
                raise SparqlError("';' without a preceding pattern")
            i += 1
            continue
        if subj is None:
            subj = term(toks[i])
            i += 1
        if i + 1 >= len(toks):
            raise SparqlError("truncated triple pattern")
        pred, obj = term(toks[i]), term(toks[i + 1])
        patterns.append((subj, pred, obj))
        i += 2
    if i >= len(toks) or toks[i][1] != "}":
        raise SparqlError("expected '}'")
    i += 1
    limit = None
    if i < len(toks) and toks[i][1].upper() == "LIMIT":
        if i + 1 >= len(toks) or not toks[i + 1][1].isdigit():
            raise SparqlError("LIMIT requires a non-negative integer")
        limit = int(toks[i + 1][1])
        i += 2
    if i != len(toks):
        raise SparqlError(f"trailing tokens: {[t[1] for t in toks[i:]]}")
    if not patterns:
        raise SparqlError("empty graph pattern")
    return select_vars, star, distinct, patterns, limit


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL BGP SELECT against the triples relation."""
    select_vars, star, distinct, patterns, limit = _parse(query)

    def pattern_df(s: _Term, p: _Term, o: _Term) -> DataFrame:
        df = triples
        rename: dict[str, str] = {}
        for pos, t in (("s", s), ("p", p), ("o", o)):
            if t.kind == "var":
                if t.value in rename.values():
                    # repeated variable inside one pattern → equality
                    prev = next(c for c, v in rename.items() if v == t.value)
                    df = df.filter(F.col(pos) == F.col(prev))
                else:
                    rename[pos] = t.value
            else:
                df = df.filter(F.col(pos) == t.value)
                if t.kind == "lit" and t.lang is not None:
                    df = df.filter(F.col("lang") == t.lang)
        return df.select(*[F.col(c).alias(v) for c, v in rename.items()])

    out: DataFrame | None = None
    for s, p, o in patterns:
        pdf = pattern_df(s, p, o)
        if out is None:
            out = pdf
        else:
            shared = [c for c in out.columns if c in pdf.columns]
            out = out.join(pdf, on=shared) if shared else out.crossJoin(pdf)
    assert out is not None

    if not star:
        missing = [v for v in select_vars if v not in out.columns]
        if missing:
            raise SparqlError(f"SELECT variables not bound in pattern: {missing}")
        out = out.select(*select_vars)
    if distinct:
        out = out.distinct()
    if limit is not None:
        out = out.limit(limit)
    return out
