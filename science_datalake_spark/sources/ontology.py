"""Ontology converters: OBO, N-Triples, Turtle and RDF/XML (SKOS) → the
standard 3-table model (terms / hierarchy / xrefs), SURVEY §2.1 S7-S8.

Reference parallel: convert_ontologies.py:254-324 (OBO via pronto),
:327-439 (SKOS via rdflib over ttl/nt/rdf/owl), :442-546 (MeSH N-Triples)
→ per-ontology Parquet tables (:726-774). Neither pronto nor rdflib is
available here, and neither is needed: OBO's stanza format, N-Triples'
line format, and the Turtle/RDF-XML subset that real SKOS thesauri use
(PhySH, AGROVOC, UNESCO, STW in ontology_registry.py) are parsed
directly. Parsing runs driver-side — ontology files are ≤ a few hundred
MB (SURVEY S7 note) — while everything downstream (hierarchy traversal,
bridging, alignment) is distributed DataFrame work.

All RDF-family formats funnel through one quad representation
``(subject, predicate, object, lang)`` and one SKOS walk
(:func:`skos_quads_to_tables`), mirroring export_parquet_skos
(convert_ontologies.py:352-439): prefLabel/rdfs:label → label (English
preferred), definition/scopeNote → definition, altLabel → synonyms,
broader/broaderTransitive/narrower → hierarchy, {exact,close,related}Match
→ xrefs keyed by the match relation.

Output schemas (SCHEMA.md:891-918):
  terms(id, label, definition, synonyms ARRAY<STRING>, namespace, obsolete)
  hierarchy(parent_id, child_id, relation)
  xrefs(term_id, xref_db, xref_id)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from science_datalake_spark.util import local_df

TERMS_SCHEMA = (
    "id STRING, label STRING, definition STRING, synonyms ARRAY<STRING>, "
    "namespace STRING, obsolete BOOLEAN"
)
HIERARCHY_SCHEMA = "parent_id STRING, child_id STRING, relation STRING"
XREFS_SCHEMA = "term_id STRING, xref_db STRING, xref_id STRING"

#: (subject, predicate, object, language-tag-or-None)
Quad = tuple[str, str, str, "str | None"]


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
        terms=local_df(spark, term_rows, TERMS_SCHEMA),
        hierarchy=local_df(spark, hier_rows or [], HIERARCHY_SCHEMA),
        xrefs=local_df(spark, xref_rows or [], XREFS_SCHEMA),
    )


# ---------------------------------------------------------------------------
# RDF-family parsers → quads
# ---------------------------------------------------------------------------

_NT_RE = re.compile(
    r"^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|\"((?:[^\"\\]|\\.)*)\"(?:@(\S+?))?(?:\^\^<[^>]+>)?)\s*\.\s*$"
)

_SKOS = "http://www.w3.org/2004/02/skos/core#"
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"

#: predicate → role mapping (the SKOS + RDFS subset the reference extracts,
#: convert_ontologies.py:352-439)
_LABEL_PREDS = {_SKOS + "prefLabel", _RDFS + "label"}
_DEFINITION_PREDS = {_SKOS + "definition", _SKOS + "scopeNote"}
_SYNONYM_PREDS = {_SKOS + "altLabel"}
_BROADER_PREDS = {_SKOS + "broader": "broader", _SKOS + "broaderTransitive": "broaderTransitive"}
_NARROWER_PRED = _SKOS + "narrower"
_MATCH_PREDS = {_SKOS + "exactMatch", _SKOS + "closeMatch", _SKOS + "relatedMatch"}


def parse_ntriples(text: str) -> list[Quad]:
    """(subject, predicate, object, lang) quads; object is IRI or literal.
    Malformed lines and comments are skipped (tolerant-read, SURVEY S3
    spirit)."""
    out: list[Quad] = []
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


# Turtle token grammar — the subset real SKOS thesauri use: @prefix/@base
# (and SPARQL-style PREFIX/BASE), IRIs, prefixed names, `a`, string
# literals with language tags or datatypes, numeric/boolean literals,
# `;`/`,` predicate-object lists, and anonymous bnodes `[ ... ]`.
# No collections `( )` and no multi-line long strings beyond ''' / \"\"\".
_TTL_TOKEN = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<iriref><[^<>"{}|^`\\\s]*>)
  | (?P<longstring>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<prefix_kw>@prefix\b|@base\b|PREFIX\b|BASE\b)
  | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<punct>[;,.\[\]])
  # PN_LOCAL may contain dots only INTERNALLY — a trailing '.' is the
  # statement terminator ('c:physics.' = IRI c:physics + '.'), so the
  # local part is dot-separated word runs that never end in a dot
  | (?P<pname>(?:[A-Za-z_][\w-]*)?:(?:[\w%-]+(?:\.[\w%-]+)*)?)
  | (?P<kw_a>\ba\b)
  | (?P<bool>\btrue\b|\bfalse\b)
  | (?P<num>[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
  | (?P<ws>\s+)
    """,
    re.X,
)


#: Turtle string-escape decoding (one pass): \uXXXX / \UXXXXXXXX unicode
#: escapes plus the ECHAR set; an unknown escaped char decodes to itself.
_TTL_ESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)")
_TTL_ECHAR = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}


def _ttl_escape_repl(m: re.Match[str]) -> str:
    s = m.group(1)
    if len(s) in (5, 9) and s[0] in "uU":
        return chr(int(s[1:], 16))
    return _TTL_ECHAR.get(s, s)


def _ttl_tokens(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TTL_TOKEN.match(text, pos)
        if m is None:
            pos += 1  # tolerant: skip unrecognized byte
            continue
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        toks.append((kind, m.group()))
    return toks


def parse_turtle(text: str) -> list[Quad]:
    """Minimal Turtle parser → quads (subset documented on _TTL_TOKEN).

    Covers the SKOS thesauri shapes in the reference registry (PhySH .ttl,
    ontology_registry.py:120-140): prefixed names, `a`, `;`/`,` lists,
    language-tagged literals, anonymous bnode objects. Datatype IRIs are
    dropped (the 3-table model keeps lexical forms only); malformed runs
    are skipped tolerantly rather than raising.
    """
    toks = _ttl_tokens(text)
    prefixes: dict[str, str] = {}
    quads: list[Quad] = []
    bnode_n = 0
    i = 0

    def resolve(kind: str, value: str) -> str | None:
        if kind == "iriref":
            return value[1:-1]
        if kind == "pname":
            pfx, _, local = value.partition(":")
            base = prefixes.get(pfx)
            return (base + local) if base is not None else value
        if kind == "kw_a":
            return _RDF + "type"
        return None

    def unquote(value: str) -> str:
        if value.startswith(('"""', "'''")):
            body = value[3:-3]
        else:
            body = value[1:-1]
        # single left-to-right pass: each backslash consumes exactly the
        # escape it introduces. Sequential str.replace decoded r'\\n' to
        # backslash+newline (the '\n' replace saw the second backslash)
        # instead of backslash+'n' (round-3 advice finding).
        return _TTL_ESCAPE_RE.sub(_ttl_escape_repl, body)

    def parse_object(j: int, subj: str, pred: str) -> int:
        """Parse one object at token j, emit quad(s); return next index."""
        nonlocal bnode_n
        if j >= len(toks):
            return j
        kind, value = toks[j]
        if kind in ("iriref", "pname", "kw_a"):
            quads.append((subj, pred, resolve(kind, value) or value, None))
            return j + 1
        if kind in ("string", "longstring"):
            lit = unquote(value)
            lang: str | None = None
            j += 1
            if j < len(toks) and toks[j][0] == "langtag":
                lang = toks[j][1][1:]
                j += 1
            elif j < len(toks) and toks[j][0] == "dtype":
                j += 2  # skip ^^ and the datatype IRI
            quads.append((subj, pred, lit, lang))
            return j
        if kind in ("num", "bool"):
            quads.append((subj, pred, value, None))
            return j + 1
        if (kind, value) == ("punct", "["):
            bnode_n += 1
            bid = f"_:b{bnode_n}"
            quads.append((subj, pred, bid, None))
            return parse_predicate_object_list(j + 1, bid, stop="]") + 1
        return j + 1  # tolerant skip

    def parse_predicate_object_list(j: int, subj: str, stop: str = ".") -> int:
        """Parse `pred obj (, obj)* (; pred obj...)*` until `stop` token;
        return index OF the stop token."""
        while j < len(toks):
            kind, value = toks[j]
            if (kind, value) == ("punct", stop):
                return j
            if kind == "punct" and value == ";":
                j += 1
                continue
            pred = resolve(kind, value)
            if pred is None:
                j += 1  # tolerant: not a predicate where one was expected
                continue
            j += 1
            j = parse_object(j, subj, pred)
            while j < len(toks) and toks[j] == ("punct", ","):
                j = parse_object(j + 1, subj, pred)
        return j

    while i < len(toks):
        kind, value = toks[i]
        if kind == "prefix_kw":
            if value.lstrip("@").lower() == "prefix" and i + 2 < len(toks):
                pname, iriref = toks[i + 1], toks[i + 2]
                if pname[0] == "pname" and iriref[0] == "iriref":
                    prefixes[pname[1].rstrip(":").partition(":")[0]] = iriref[1][1:-1]
                i += 3
            else:
                i += 2  # @base <iri>
            if i < len(toks) and toks[i] == ("punct", "."):
                i += 1
            continue
        subj = resolve(kind, value)
        if subj is None:
            i += 1  # tolerant: skip until something subject-shaped
            continue
        i = parse_predicate_object_list(i + 1, subj)
        i += 1  # consume the terminating '.'
    return quads


_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def parse_rdf_xml(text: str) -> list[Quad]:
    """RDF/XML → quads via xml.etree (stdlib; reference uses rdflib,
    convert_ontologies.py:344-349).

    Subset: top-level (and nested) node elements with rdf:about/rdf:ID,
    property elements with rdf:resource or literal text + xml:lang, typed
    node elements (`<skos:Concept rdf:about=…>` ⇒ rdf:type quad). Covers
    the UNESCO/STW `.rdf` exports in the reference registry.
    """
    root = ET.fromstring(text)
    quads: list[Quad] = []

    def expand(tag: str) -> str:
        # ElementTree encodes namespaced tags as '{ns}local'
        return tag[1:].replace("}", "", 1) if tag.startswith("{") else tag

    def about_of(el: ET.Element) -> str | None:
        return el.get(f"{{{_RDF}}}about") or el.get(f"{{{_RDF}}}ID")

    def walk_node(el: ET.Element) -> None:
        subj = about_of(el)
        if subj is None:
            return
        tag_iri = expand(el.tag)
        if tag_iri != _RDF + "Description":
            quads.append((subj, _RDF + "type", tag_iri, None))
        for prop in el:
            pred = expand(prop.tag)
            res = prop.get(f"{{{_RDF}}}resource")
            if res is not None:
                quads.append((subj, pred, res, None))
                continue
            nested = [c for c in prop if about_of(c) is not None]
            if nested:  # property → nested node element
                for c in nested:
                    quads.append((subj, pred, about_of(c), None))
                    walk_node(c)
                continue
            lit = (prop.text or "").strip()
            if lit:
                quads.append((subj, pred, lit, prop.get(_XML_LANG)))

    for el in root:
        walk_node(el)
    return quads


# ---------------------------------------------------------------------------
# Shared SKOS walk: quads → 3-table model
# ---------------------------------------------------------------------------


def skos_quads_to_tables(
    spark: SparkSession, quads: list[Quad], lang: str = "en"
) -> OntologyTables:
    """SKOS quads → 3-table model with reference semantics
    (convert_ontologies.py:352-439): prefLabel/rdfs:label → label with
    the reference's exact fallback rule ``if lang == 'en' or not label``
    — a ``lang``-tagged value replaces anything, otherwise the FIRST
    label seen wins (tagged or not), so a concept with only foreign
    labels keeps one rather than NULL. definition/scopeNote → definition
    (same rule), altLabel → synonyms (``lang`` or untagged only, like
    the reference), broader/broaderTransitive → hierarchy, narrower
    inverted, the three *Match predicates → xrefs with the match
    relation as xref_db and the full target IRI as xref_id."""

    def prefer(store: dict[str, tuple[str, int]], s: str, o: str, ol: str | None) -> None:
        rank = 1 if ol == lang else 0
        if s not in store or rank > store[s][1]:
            store[s] = (o, rank)

    labels: dict[str, tuple[str, int]] = {}
    definitions: dict[str, tuple[str, int]] = {}
    synonyms: dict[str, list[str]] = {}
    hier: list[tuple[str, str, str]] = []
    xrefs: list[tuple[str, str, str]] = []
    subjects: set[str] = set()
    for s, p, o, ol in quads:
        subjects.add(s)
        if p in _LABEL_PREDS:
            prefer(labels, s, o, ol)
        elif p in _DEFINITION_PREDS:
            prefer(definitions, s, o, ol)
        elif p in _SYNONYM_PREDS and (ol is None or ol == lang):
            synonyms.setdefault(s, []).append(o)
        elif p in _BROADER_PREDS:
            hier.append((o, s, _BROADER_PREDS[p]))
        elif p == _NARROWER_PRED:
            hier.append((s, o, "narrower"))
        elif p in _MATCH_PREDS:
            xrefs.append((s, p.rsplit("#", 1)[-1], o))
    term_rows = [
        (
            s,
            labels.get(s, (None, False))[0],
            definitions.get(s, (None, False))[0],
            synonyms.get(s, []),
            None,
            False,
        )
        for s in sorted(subjects)
        if not s.startswith("_:")  # bnodes are not terms
    ]
    return OntologyTables(
        terms=local_df(spark, term_rows, TERMS_SCHEMA),
        hierarchy=local_df(spark, hier or [], HIERARCHY_SCHEMA),
        xrefs=local_df(spark, xrefs or [], XREFS_SCHEMA),
    )


def ntriples_to_tables(spark: SparkSession, text: str, lang: str = "en") -> OntologyTables:
    """SKOS-style N-Triples → 3-table model (S8; MeSH-shaped inputs)."""
    return skos_quads_to_tables(spark, parse_ntriples(text), lang=lang)


_SKOS_PARSERS = {
    "nt": parse_ntriples,
    "ttl": parse_turtle,
    "turtle": parse_turtle,
    "rdf": parse_rdf_xml,
    "owl": parse_rdf_xml,
    "xml": parse_rdf_xml,
}


def skos_to_tables(
    spark: SparkSession, text: str, fmt: str = "nt", lang: str = "en"
) -> OntologyTables:
    """Any SKOS serialization → 3-table model; ``fmt`` ∈ nt/ttl/rdf/owl
    (the format column of the reference registry, ontology_registry.py)."""
    try:
        parser = _SKOS_PARSERS[fmt]
    except KeyError:
        raise ValueError(f"unknown SKOS format {fmt!r}; expected {sorted(_SKOS_PARSERS)}")
    return skos_quads_to_tables(spark, parser(text), lang=lang)
