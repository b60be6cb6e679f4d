"""CSV/TSV ontology converters: MSC2020 and CSO → the 3-table model
(SURVEY §2.1 S9).

Reference parallels:
- MSC2020 (convert_ontologies.py:549-593): a TSV of (code, label,
  description); the hierarchy is DERIVED from the code structure itself —
  a 5-char code's parent is its 3-char prefix, a 3-char code's parent its
  2-char prefix (e.g. ``68T05`` → ``68T`` → ``68``). Namespace records
  the level as ``level_<len>``.
- CSO (convert_ontologies.py:596-723): a CSV of N-Triples-ish rows
  (subject, predicate, object) with CSO schema predicates —
  superTopicOf/contributesTo → hierarchy, relatedEquivalent/
  preferentialEquivalent → synonyms, sameAs/relatedLink → xrefs typed by
  target domain (wikidata/dbpedia/wikipedia/freebase), rdfs:label →
  label, with the topic name recoverable from the ``/topics/<name>`` URI
  tail when no label triple exists.

Parsing is driver-side (both files are ≤ a few MB); outputs are
DataFrames like every other converter in this package.
"""

from __future__ import annotations

import csv
import io
import re
from urllib.parse import unquote

from pyspark.sql import SparkSession

from science_datalake_spark.sources.ontology import (
    HIERARCHY_SCHEMA,
    TERMS_SCHEMA,
    XREFS_SCHEMA,
    OntologyTables,
)
from science_datalake_spark.util import local_df


def msc_csv_to_tables(
    spark: SparkSession, text: str, delimiter: str = "\t"
) -> OntologyTables:
    """MSC2020 TSV → 3-table model with code-prefix-derived hierarchy."""
    reader = csv.reader(io.StringIO(text), delimiter=delimiter)
    next(reader, None)  # header
    term_rows: list[tuple] = []
    hier_rows: list[tuple] = []
    for row in reader:
        if len(row) < 2:
            continue
        code = row[0].strip()
        if not code:
            continue
        label = row[1].strip() if len(row) > 1 else ""
        definition = row[2].strip() if len(row) > 2 else ""
        term_rows.append(
            (f"MSC:{code}", label, definition, [], f"level_{len(code)}", False)
        )
        # hierarchy from the code structure (convert_ontologies.py:578-590)
        if len(code) == 5:
            hier_rows.append((f"MSC:{code[:3]}", f"MSC:{code}", "is_a"))
        elif len(code) == 3:
            hier_rows.append((f"MSC:{code[:2]}", f"MSC:{code}", "is_a"))
    return OntologyTables(
        terms=local_df(spark, term_rows, TERMS_SCHEMA),
        hierarchy=local_df(spark, hier_rows, HIERARCHY_SCHEMA),
        xrefs=local_df(spark, [], XREFS_SCHEMA),
    )


_CSO = "http://cso.kmi.open.ac.uk/schema/cso#"
_CSO_SUPER = _CSO + "superTopicOf"
_CSO_CONTRIB = _CSO + "contributesTo"
_CSO_EQUIV = {_CSO + "relatedEquivalent", _CSO + "preferentialEquivalent"}
_CSO_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
_CSO_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
_CSO_RELATED_LINK = "http://schema.org/relatedLink"

#: relatedLink target → xref_db (convert_ontologies.py:657-669)
_LINK_DOMAINS = (
    ("wikidata.org", "wikidata"),
    ("dbpedia.org", "dbpedia"),
    ("wikipedia.org", "wikipedia"),
    ("freebase.com", "freebase"),
)

_LANG_TAG_RE = re.compile(r"@\w+\s*\.?\s*$")


def _cso_strip(s: str) -> str:
    """Angle brackets, quotes, trailing N-Triples language tags."""
    s = s.strip().strip('"').strip("<>")
    return _LANG_TAG_RE.sub("", s)


def _topic_name(uri: str) -> str:
    if "/topics/" in uri:
        return unquote(uri.split("/topics/")[-1]).replace("_", " ")
    return uri


def cso_csv_to_tables(spark: SparkSession, text: str) -> OntologyTables:
    """CSO triples CSV → 3-table model (reference semantics
    convert_ontologies.py:596-723)."""
    labels: dict[str, str] = {}
    children: list[tuple[str, str]] = []
    contributes: list[tuple[str, str]] = []
    synonyms: dict[str, list[str]] = {}
    xref_rows: list[tuple] = []
    topics: set[str] = set()

    for row in csv.reader(io.StringIO(text)):
        if len(row) < 3:
            continue
        s, p, o = (_cso_strip(v) for v in row[:3])
        if p == _CSO_LABEL:
            labels[s] = o
            topics.add(s)
        elif p == _CSO_SUPER:
            children.append((s, o))
            topics.update((s, o))
        elif p == _CSO_CONTRIB:
            contributes.append((s, o))
            topics.update((s, o))
        elif p in _CSO_EQUIV:
            synonyms.setdefault(s, []).append(o)
            topics.update((s, o))
        elif p == _CSO_SAMEAS:
            xref_rows.append((s, "sameAs", o))
        elif p == _CSO_RELATED_LINK:
            db = next((d for host, d in _LINK_DOMAINS if host in o), "relatedLink")
            xref_rows.append((s, db, o))

    term_rows = [
        (
            uri,
            labels.get(uri, _topic_name(uri)),
            "",
            [labels.get(syn, _topic_name(syn)) for syn in synonyms.get(uri, [])],
            "",
            False,
        )
        for uri in sorted(topics)
    ]
    hier_rows = [(parent, child, "superTopicOf") for parent, child in children] + [
        (target, source, "contributesTo") for source, target in contributes
    ]
    return OntologyTables(
        terms=local_df(spark, term_rows, TERMS_SCHEMA),
        hierarchy=local_df(spark, hier_rows, HIERARCHY_SCHEMA),
        xrefs=local_df(spark, xref_rows, XREFS_SCHEMA),
    )
