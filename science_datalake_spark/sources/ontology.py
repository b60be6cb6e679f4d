"""Ontology converters: OBO and N-Triples → the standard 3-table model
(terms / hierarchy / xrefs), SURVEY §2.1 S7-S8.

Reference parallel: convert_ontologies.py:254-324 (OBO via pronto),
:442-546 (MeSH N-Triples via rdflib) → per-ontology Parquet tables
(:726-774). Neither pronto nor rdflib is available here, and neither is
needed: OBO's stanza format and N-Triples' line format are simple enough
to parse directly. Parsing runs driver-side — ontology files are ≤ a few
hundred MB (SURVEY S7 note) — while everything downstream (hierarchy
traversal, bridging, alignment) is distributed DataFrame work.

Output schemas (SCHEMA.md:891-918):
  terms(id, label, definition, synonyms ARRAY<STRING>, namespace, obsolete)
  hierarchy(parent_id, child_id, relation)
  xrefs(term_id, xref_db, xref_id)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TERMS_SCHEMA = (
    "id STRING, label STRING, definition STRING, synonyms ARRAY<STRING>, "
    "namespace STRING, obsolete BOOLEAN"
)
HIERARCHY_SCHEMA = "parent_id STRING, child_id STRING, relation STRING"
XREFS_SCHEMA = "term_id STRING, xref_db STRING, xref_id STRING"


@dataclass
class OntologyTables:
    terms: DataFrame
    hierarchy: DataFrame
    xrefs: DataFrame


@dataclass
class _Term:
    id: str = ""
    label: str | None = None
    definition: str | None = None
    synonyms: list[str] = field(default_factory=list)
    namespace: str | None = None
    obsolete: bool = False
    parents: list[tuple[str, str]] = field(default_factory=list)  # (parent, relation)
    xrefs: list[tuple[str, str]] = field(default_factory=list)  # (db, id)


_SYN_RE = re.compile(r'^synonym:\s*"([^"]*)"')
_DEF_RE = re.compile(r'^def:\s*"([^"]*)"')


def parse_obo(text: str) -> list[_Term]:
    """Minimal OBO 1.2/1.4 [Term]-stanza parser (the subset the 3-table
    model needs: id/name/def/synonym/namespace/is_obsolete/is_a/
    relationship/xref)."""
    terms: list[_Term] = []
    cur: _Term | None = None
    in_term = False
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("["):
            if cur is not None:
                terms.append(cur)
                cur = None
            in_term = line == "[Term]"
            if in_term:
                cur = _Term()
            continue
        if not in_term or cur is None or not line or line.startswith("!"):
            continue
        key, _, val = line.partition(":")
        val = val.strip()
        val = val.split(" !")[0].strip()  # trailing comments
        if key == "id":
            cur.id = val
        elif key == "name":
            cur.label = val
        elif key == "def":
            m = _DEF_RE.match(line)
            cur.definition = m.group(1) if m else val
        elif key == "synonym":
            m = _SYN_RE.match(line)
            if m:
                cur.synonyms.append(m.group(1))
        elif key == "namespace":
            cur.namespace = val
        elif key == "is_obsolete":
            cur.obsolete = val.lower() == "true"
        elif key == "is_a":
            cur.parents.append((val, "is_a"))
        elif key == "relationship":
            parts = val.split()
            if len(parts) >= 2:
                cur.parents.append((parts[1], parts[0]))
        elif key == "xref":
            db, _, xid = val.partition(":")
            if xid:
                cur.xrefs.append((db, xid.split()[0]))
    if cur is not None:
        terms.append(cur)
    return terms


def obo_to_tables(spark: SparkSession, text: str) -> OntologyTables:
    parsed = parse_obo(text)
    term_rows = [
        (t.id, t.label, t.definition, t.synonyms, t.namespace, t.obsolete) for t in parsed
    ]
    hier_rows = [(p, t.id, rel) for t in parsed for p, rel in t.parents]
    xref_rows = [(t.id, db, xid) for t in parsed for db, xid in t.xrefs]
    return OntologyTables(
        terms=spark.createDataFrame(term_rows, TERMS_SCHEMA),
        hierarchy=spark.createDataFrame(hier_rows or [], HIERARCHY_SCHEMA),
        xrefs=spark.createDataFrame(xref_rows or [], XREFS_SCHEMA),
    )


_NT_RE = re.compile(
    r"^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|\"((?:[^\"\\]|\\.)*)\"(?:@(\S+?))?(?:\^\^<[^>]+>)?)\s*\.\s*$"
)

#: predicate → role mapping (SKOS + RDFS subset the reference extracts)
_LABEL_PREDS = {
    "http://www.w3.org/2004/02/skos/core#prefLabel",
    "http://www.w3.org/2000/01/rdf-schema#label",
}
_SYNONYM_PREDS = {"http://www.w3.org/2004/02/skos/core#altLabel"}
_BROADER_PREDS = {"http://www.w3.org/2004/02/skos/core#broader"}
_MATCH_PREDS = {
    "http://www.w3.org/2004/02/skos/core#exactMatch",
    "http://www.w3.org/2004/02/skos/core#closeMatch",
    "http://www.w3.org/2004/02/skos/core#relatedMatch",
}


def parse_ntriples(text: str) -> list[tuple[str, str, str, str | None]]:
    """(subject, predicate, object, lang) tuples; object is IRI or literal."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT_RE.match(line)
        if not m:
            continue
        s, p, o_iri, o_lit, lang = m.groups()
        obj = o_iri if o_iri is not None else o_lit.replace('\\"', '"')
        out.append((s, p, obj, lang))
    return out


def ntriples_to_tables(spark: SparkSession, text: str, lang: str = "en") -> OntologyTables:
    """SKOS-style N-Triples → 3-table model (prefLabel→label, altLabel→
    synonyms, broader→hierarchy, *Match→xrefs; reference semantics
    convert_ontologies.py:327-439)."""
    triples = parse_ntriples(text)
    labels: dict[str, str] = {}
    synonyms: dict[str, list[str]] = {}
    hier: list[tuple[str, str, str]] = []
    xrefs: list[tuple[str, str, str]] = []
    subjects: set[str] = set()
    for s, p, o, ol in triples:
        subjects.add(s)
        if p in _LABEL_PREDS and (ol is None or ol == lang):
            labels.setdefault(s, o)
        elif p in _SYNONYM_PREDS and (ol is None or ol == lang):
            synonyms.setdefault(s, []).append(o)
        elif p in _BROADER_PREDS:
            hier.append((o, s, "broader"))
        elif p in _MATCH_PREDS:
            db, _, xid = o.rpartition("/")
            xrefs.append((s, db or "iri", xid))
    term_rows = [
        (s, labels.get(s), None, synonyms.get(s, []), None, False) for s in sorted(subjects)
    ]
    return OntologyTables(
        terms=spark.createDataFrame(term_rows, TERMS_SCHEMA),
        hierarchy=spark.createDataFrame(hier or [], HIERARCHY_SCHEMA),
        xrefs=spark.createDataFrame(xrefs or [], XREFS_SCHEMA),
    )
