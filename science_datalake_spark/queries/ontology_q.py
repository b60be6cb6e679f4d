"""Ontology query: SKOS thesaurus → hierarchy k-hop rollup (SURVEY §2.1
S8 + §2.9 ontology walkers as a driver-checked query).

The input is an embedded SKOS **Turtle** document — exercising the
sources/ontology.py Turtle parser (reference: convert_ontologies.py:
327-439 parses PhySH/AGROVOC/UNESCO/STW SKOS via rdflib; here the same
walk runs on a dependency-free parser). Parsing is driver-side (ontology
files are small); the traversal itself is distributed DataFrame
self-joins — the identical plan shape used on real hierarchies by
operators/graph.k_hop.

The DuckDB oracle replicates the *expected parse output* as VALUES and
the same 2-hop traversal relationally, so a parser regression (dropped
edge, wrong label language preference) shows up as a hash mismatch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from science_datalake_spark.queries import query

_C = "https://ex.org/concepts/"

#: SKOS Turtle fixture: prefixed names, `a`, `;`/`,` lists, language
#: tags (de labels must lose to en), altLabel, broader, narrower,
#: exactMatch — the predicate subset of convert_ontologies.py:352-439.
_TTL_FIXTURE = """
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix c: <https://ex.org/concepts/> .

c:science a skos:Concept ;
    skos:prefLabel "Science"@en ;
    skos:definition "Systematic knowledge of the world"@en .

c:physics a skos:Concept ;
    skos:prefLabel "Physik"@de , "Physics"@en ;
    skos:altLabel "physical sciences"@en ;
    skos:broader c:science .

c:quantum a skos:Concept ;
    skos:prefLabel "Quantum mechanics"@en ;
    skos:broader c:physics ;
    skos:exactMatch <https://www.wikidata.org/entity/Q944> .

c:optics a skos:Concept ;
    skos:prefLabel "Optics"@en ;
    skos:broader c:physics .

c:qft a skos:Concept ;
    skos:prefLabel "Quantum field theory"@en ;
    skos:broader c:quantum .

c:chemistry a skos:Concept ;
    skos:prefLabel "Chemistry"@en ;
    skos:broader c:science .

c:biology a skos:Concept ;
    skos:prefLabel "Biology"@en ;
    skos:broader c:science ;
    skos:narrower c:genetics .

c:genetics a skos:Concept ;
    skos:prefLabel "Genetics"@en .
"""


@query(
    "sparql_bgp_children",
    oracle=f"""
    WITH triples(s, p, o) AS (VALUES
        ('{_C}physics',   'http://www.w3.org/2004/02/skos/core#broader', '{_C}science'),
        ('{_C}quantum',   'http://www.w3.org/2004/02/skos/core#broader', '{_C}physics'),
        ('{_C}optics',    'http://www.w3.org/2004/02/skos/core#broader', '{_C}physics'),
        ('{_C}qft',       'http://www.w3.org/2004/02/skos/core#broader', '{_C}quantum'),
        ('{_C}chemistry', 'http://www.w3.org/2004/02/skos/core#broader', '{_C}science'),
        ('{_C}biology',   'http://www.w3.org/2004/02/skos/core#broader', '{_C}science'),
        ('{_C}physics',   'http://www.w3.org/2004/02/skos/core#prefLabel', 'Physics'),
        ('{_C}quantum',   'http://www.w3.org/2004/02/skos/core#prefLabel', 'Quantum mechanics'),
        ('{_C}optics',    'http://www.w3.org/2004/02/skos/core#prefLabel', 'Optics')
    )
    SELECT b.s AS concept, l.o AS label
    FROM triples b
    JOIN triples l ON l.s = b.s
          AND l.p = 'http://www.w3.org/2004/02/skos/core#prefLabel'
    WHERE b.p = 'http://www.w3.org/2004/02/skos/core#broader'
      AND b.o = '{_C}physics'
    ORDER BY concept
    """,
)
def sparql_bgp_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-BGP surface check: the same 2-pattern join the oracle writes
    relationally, expressed as SPARQL over the fixture's parsed quads and
    translated to DataFrame joins by science_datalake_spark.sparql."""
    from science_datalake_spark.sources.ontology import parse_turtle
    from science_datalake_spark.sparql import quads_to_triples_df, sparql_select

    triples = quads_to_triples_df(spark, parse_turtle(_TTL_FIXTURE))
    q = """
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    PREFIX c: <https://ex.org/concepts/>
    SELECT ?concept ?label WHERE {
        ?concept skos:broader c:physics ;
                 skos:prefLabel ?label .
    }
    """
    return sparql_select(triples, q).orderBy("concept")


@query(
    "sparql_agg_stats",
    # rotated into the driver registry round 7 (never driver-proven)
    oracle=f"""
    WITH broader(c, parent) AS (VALUES
        ('{_C}physics',   '{_C}science'),
        ('{_C}quantum',   '{_C}physics'),
        ('{_C}optics',    '{_C}physics'),
        ('{_C}qft',       '{_C}quantum'),
        ('{_C}chemistry', '{_C}science'),
        ('{_C}biology',   '{_C}science')
    ),
    labels(c, lbl) AS (VALUES
        ('{_C}physics',   'Physics'),
        ('{_C}quantum',   'Quantum mechanics'),
        ('{_C}optics',    'Optics'),
        ('{_C}qft',       'Quantum field theory'),
        ('{_C}chemistry', 'Chemistry'),
        ('{_C}biology',   'Biology')
    ),
    w(c, w) AS (VALUES
        ('{_C}physics', 2.0), ('{_C}quantum', 2.0), ('{_C}optics', 3.0),
        ('{_C}qft', 5.0), ('{_C}chemistry', 1.0), ('{_C}biology', 4.0)
    )
    SELECT b.parent AS parent,
           count(*) AS n_children,
           CAST(sum(w.w) AS DOUBLE) AS total_w,
           CAST(avg(w.w) AS DOUBLE) AS avg_w,
           CAST(max(w.w * 10) AS DOUBLE) AS max_w10,
           string_agg(l.lbl, ', ' ORDER BY l.lbl) AS labels
    FROM broader b
    JOIN labels l ON l.c = b.c
    JOIN w ON w.c = b.c
    GROUP BY b.parent ORDER BY parent
    """,
)
def sparql_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 set functions + BIND + VALUES end-to-end (round-6
    verdict "Next round" #4): per-parent child counts, SUM/AVG over
    VALUES-supplied numeric weights, a BIND-derived arithmetic column
    aggregated with MAX, and a deterministic GROUP_CONCAT of the
    English labels — the 'average synonyms per namespace' ontology-
    statistics shape (reference surface: sparql_query.py:89-143, which
    accepts all of these via Oxigraph). The oracle replays the parsed
    fixture relationally, so a parser or lowering regression hash-
    mismatches."""
    from science_datalake_spark.sources.ontology import parse_turtle
    from science_datalake_spark.sparql import quads_to_triples_df, sparql_select

    triples = quads_to_triples_df(spark, parse_turtle(_TTL_FIXTURE))
    q = """
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    PREFIX c: <https://ex.org/concepts/>
    SELECT ?parent (COUNT(*) AS ?n_children) (SUM(?w) AS ?total_w)
           (AVG(?w) AS ?avg_w) (MAX(?w10) AS ?max_w10)
           (GROUP_CONCAT(?lbl ; SEPARATOR=", ") AS ?labels)
    WHERE {
        ?c skos:broader ?parent .
        ?c skos:prefLabel ?lbl .
        FILTER (LANG(?lbl) = "en")
        VALUES (?c ?w) {
            (c:physics "2") (c:quantum "2") (c:optics "3")
            (c:qft "5") (c:chemistry "1") (c:biology "4")
        }
        BIND (?w * 10 AS ?w10)
    }
    GROUP BY ?parent ORDER BY ?parent
    """
    return sparql_select(triples, q)


@query(
    "sparql_leaf_profile",
    aux=True,  # rested round 9 wave 3 (driver-green r7+r8; parity continues)
    oracle=f"""
    WITH broader(c, parent) AS (VALUES
        ('{_C}physics',   '{_C}science'),
        ('{_C}quantum',   '{_C}physics'),
        ('{_C}optics',    '{_C}physics'),
        ('{_C}qft',       '{_C}quantum'),
        ('{_C}chemistry', '{_C}science'),
        ('{_C}biology',   '{_C}science')
    ),
    labels(c, lbl) AS (VALUES
        ('{_C}science',   'Science'),
        ('{_C}physics',   'Physics'),
        ('{_C}quantum',   'Quantum mechanics'),
        ('{_C}optics',    'Optics'),
        ('{_C}qft',       'Quantum field theory'),
        ('{_C}chemistry', 'Chemistry'),
        ('{_C}biology',   'Biology')
    ),
    sib AS (
        SELECT parent, count(*) AS n_sib FROM broader GROUP BY parent
    )
    SELECT b.c AS c, l.lbl AS lbl, s.n_sib AS n_sib
    FROM broader b
    JOIN labels l ON l.c = b.c
    JOIN sib s ON s.parent = b.parent
    WHERE NOT EXISTS (SELECT 1 FROM broader x WHERE x.parent = b.c)
    ORDER BY c
    """,
)
def sparql_leaf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL negation + subquery end-to-end: LEAF concepts (FILTER NOT
    EXISTS — anti join on the shared variable) with their English label
    and their parent's total child count from a ``{{ SELECT ... }}``
    aggregate subquery joined back on ?parent (the aggregate-then-join
    idiom, SPARQL 1.1 §8/§12; reference surface: sparql_query.py via
    Oxigraph). The oracle replays the fixture relationally with
    NOT EXISTS + a grouped CTE, so a lowering regression in either
    feature hash-mismatches."""
    from science_datalake_spark.sources.ontology import parse_turtle
    from science_datalake_spark.sparql import quads_to_triples_df, sparql_select

    triples = quads_to_triples_df(spark, parse_turtle(_TTL_FIXTURE))
    q = """
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    SELECT ?c ?lbl ?n_sib WHERE {
        ?c skos:broader ?parent ;
           skos:prefLabel ?lbl .
        FILTER (LANG(?lbl) = "en")
        FILTER NOT EXISTS { ?child skos:broader ?c . }
        { SELECT ?parent (COUNT(?x) AS ?n_sib)
          WHERE { ?x skos:broader ?parent . } GROUP BY ?parent }
    }
    ORDER BY ?c
    """
    return sparql_select(triples, q)


@query(
    "ontology_skos_khop",
    aux=True,  # rested round 11 wave 2 (9 rounds driver-green; local parity continues)
    oracle=f"""
    WITH edges(parent_id, child_id) AS (VALUES
        ('{_C}science',  '{_C}physics'),
        ('{_C}physics',  '{_C}quantum'),
        ('{_C}physics',  '{_C}optics'),
        ('{_C}quantum',  '{_C}qft'),
        ('{_C}science',  '{_C}chemistry'),
        ('{_C}science',  '{_C}biology'),
        ('{_C}biology',  '{_C}genetics')
    ),
    terms(id, label) AS (VALUES
        ('{_C}science',   'Science'),
        ('{_C}physics',   'Physics'),
        ('{_C}quantum',   'Quantum mechanics'),
        ('{_C}optics',    'Optics'),
        ('{_C}qft',       'Quantum field theory'),
        ('{_C}chemistry', 'Chemistry'),
        ('{_C}biology',   'Biology'),
        ('{_C}genetics',  'Genetics')
    ),
    d1 AS (
        SELECT child_id AS id, 1 AS depth FROM edges
        WHERE parent_id = '{_C}science'
    ),
    d2 AS (
        SELECT e.child_id AS id, 2 AS depth
        FROM d1 JOIN edges e ON e.parent_id = d1.id
    ),
    reach AS (
        SELECT id, CAST(min(depth) AS INTEGER) AS depth
        FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        GROUP BY id
    )
    SELECT r.id AS concept_id, t.label AS label, r.depth AS depth
    FROM reach r JOIN terms t ON t.id = r.id
    ORDER BY depth, concept_id
    """,
)
def ontology_skos_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the SKOS Turtle fixture and return every concept within two
    hops below ``c:science`` with its English label and min depth.

    Plan shape (the one that scales to a 42k-term AGROVOC or a full MeSH):
    broadcast hash-join per hop (ontology edge/label tables are
    metadata-small), min-depth groupBy, then a broadcast label join — no
    driver-side traversal, no collect(), no frontier shuffle."""
    from science_datalake_spark.sources.ontology import skos_to_tables

    t = skos_to_tables(spark, _TTL_FIXTURE, fmt="ttl")
    edges = t.hierarchy.select("parent_id", "child_id")
    root = _C + "science"
    d1 = edges.filter(F.col("parent_id") == root).select(
        F.col("child_id").alias("id"), F.lit(1).alias("depth")
    )
    # hierarchy + label tables of real ontologies are metadata-small (42k
    # terms = the largest in the reference registry) — broadcast both so
    # the traversal never shuffles the frontier
    d2 = d1.join(F.broadcast(edges), d1["id"] == edges["parent_id"]).select(
        F.col("child_id").alias("id"), F.lit(2).alias("depth")
    )
    reach = d1.unionAll(d2).groupBy("id").agg(F.min("depth").alias("depth"))
    labels = t.terms.select(F.col("id"), F.col("label"))
    return (
        reach.join(F.broadcast(labels), "id")
        .select(F.col("id").alias("concept_id"), "label", "depth")
        .orderBy("depth", "concept_id")
    )


@query(
    "sparql_path_ancestors",
    aux=True,
    oracle=f"""
    WITH RECURSIVE edges(child, parent) AS (VALUES
        ('{_C}physics',   '{_C}science'),
        ('{_C}quantum',   '{_C}physics'),
        ('{_C}optics',    '{_C}physics'),
        ('{_C}qft',       '{_C}quantum'),
        ('{_C}chemistry', '{_C}science'),
        ('{_C}biology',   '{_C}science'),
        ('{_C}genetics',  '{_C}biology')
    ),
    labels(id, label) AS (VALUES
        ('{_C}science',   'Science'),
        ('{_C}physics',   'Physics'),
        ('{_C}physics',   'Physik'),
        ('{_C}quantum',   'Quantum mechanics'),
        ('{_C}optics',    'Optics'),
        ('{_C}qft',       'Quantum field theory'),
        ('{_C}chemistry', 'Chemistry'),
        ('{_C}biology',   'Biology'),
        ('{_C}genetics',  'Genetics')
    ),
    anc(node, anc) AS (
        SELECT child, parent FROM edges
        UNION
        SELECT a.node, e.parent FROM anc a JOIN edges e ON e.child = a.anc
    ),
    starred AS (
        -- skos:broader* from qft: 1..n-hop ancestors plus itself
        SELECT anc AS concept FROM anc WHERE node = '{_C}qft'
        UNION SELECT '{_C}qft'
    )
    SELECT s.concept, l.label
    FROM starred s JOIN labels l ON l.id = s.concept
    ORDER BY concept, label
    """,
)
def sparql_path_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property path (``skos:broader*``) over the parsed Turtle
    fixture: every ancestor of qft INCLUDING itself (zero-length match),
    joined to its prefLabels by a second BGP pattern (physics carries an
    @en and an @de label — both bind, and the oracle lists both). Translated to a
    transitive_closure plan by science_datalake_spark.sparql (the
    reference's Oxigraph ancestor-walk surface, sparql_query.py:89-143);
    the DuckDB oracle replays the same closure as a recursive CTE."""
    from science_datalake_spark.sources.ontology import parse_turtle
    from science_datalake_spark.sparql import quads_to_triples_df, sparql_select

    triples = quads_to_triples_df(spark, parse_turtle(_TTL_FIXTURE))
    q = """
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    PREFIX c: <https://ex.org/concepts/>
    SELECT ?concept ?label WHERE {
        c:qft skos:broader* ?concept .
        ?concept skos:prefLabel ?label
    }
    """
    return sparql_select(triples, q).orderBy("concept")


@query(
    "sparql_count_group",
    aux=True,  # rested round 9 (driver-green r7+r8; sparql family keeps 3 rows)
    oracle=f"""
    WITH broader(c, parent) AS (VALUES
        ('{_C}physics',   '{_C}science'),
        ('{_C}quantum',   '{_C}physics'),
        ('{_C}optics',    '{_C}physics'),
        ('{_C}qft',       '{_C}quantum'),
        ('{_C}chemistry', '{_C}science'),
        ('{_C}biology',   '{_C}science')
    ),
    labels(c, label) AS (VALUES
        ('{_C}physics',   'Physik'),
        ('{_C}physics',   'Physics'),
        ('{_C}quantum',   'Quantum mechanics'),
        ('{_C}optics',    'Optics'),
        ('{_C}qft',       'Quantum field theory'),
        ('{_C}chemistry', 'Chemistry'),
        ('{_C}biology',   'Biology')
    )
    SELECT b.parent, count(*) AS n_rows, count(DISTINCT b.c) AS n_children
    FROM broader b JOIN labels l ON l.c = b.c
    GROUP BY b.parent
    ORDER BY b.parent
    """,
)
def sparql_count_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 COUNT aggregates with GROUP BY — the ontology-statistics
    shape (children and solution counts per parent term) that the
    reference serves from Oxigraph (sparql_query.py:89-143). The
    translator delegates to a DataFrame groupBy (one partial-combinable
    hash aggregate); physics' two prefLabels (en + de) make n_rows
    diverge from n_children, pinning the COUNT(*) vs COUNT(DISTINCT ?v)
    distinction against the relational twin."""
    from science_datalake_spark.sources.ontology import parse_turtle
    from science_datalake_spark.sparql import quads_to_triples_df, sparql_select

    triples = quads_to_triples_df(spark, parse_turtle(_TTL_FIXTURE))
    q = """
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    SELECT ?parent (COUNT(*) AS ?n_rows) (COUNT(DISTINCT ?c) AS ?n_children)
    WHERE {
        ?c skos:broader ?parent ;
           skos:prefLabel ?label .
    }
    GROUP BY ?parent
    """
    return sparql_select(triples, q).orderBy("parent")


@query(
    "sparql_path_range",
    # rotated INTO driver round 9 wave 3 (driver evidence derived by tools/rotation_audit.py)
    oracle=f"""
    WITH edges(child, parent) AS (VALUES
        ('{_C}physics',   '{_C}science'),
        ('{_C}quantum',   '{_C}physics'),
        ('{_C}optics',    '{_C}physics'),
        ('{_C}qft',       '{_C}quantum'),
        ('{_C}chemistry', '{_C}science'),
        ('{_C}biology',   '{_C}science'),
        ('{_C}genetics',  '{_C}biology')
    ),
    labels(id, label) AS (VALUES
        ('{_C}science',   'Science'),
        ('{_C}physics',   'Physics'),
        ('{_C}physics',   'Physik'),
        ('{_C}quantum',   'Quantum mechanics'),
        ('{_C}optics',    'Optics'),
        ('{_C}qft',       'Quantum field theory'),
        ('{_C}chemistry', 'Chemistry'),
        ('{_C}biology',   'Biology'),
        ('{_C}genetics',  'Genetics')
    ),
    hops AS (
        SELECT parent AS concept FROM edges WHERE child = '{_C}qft'
        UNION
        SELECT e2.parent FROM edges e1
        JOIN edges e2 ON e2.child = e1.parent
        WHERE e1.child = '{_C}qft'
    )
    SELECT h.concept, l.label
    FROM hops h JOIN labels l ON l.id = h.concept
    ORDER BY concept, label
    """,
)
def sparql_path_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL range-quantified property path (``skos:broader{1,2}`` —
    the draft-era bounded repetition several engines kept): ancestors of
    qft exactly 1 or 2 hops up, joined to their prefLabels (physics binds
    both its @en and @de labels). Lowered to a finite union of edge
    powers by sparql.py's group_df; the DuckDB twin enumerates the same
    two hop lengths as explicit joins."""
    from science_datalake_spark.sources.ontology import parse_turtle
    from science_datalake_spark.sparql import quads_to_triples_df, sparql_select

    triples = quads_to_triples_df(spark, parse_turtle(_TTL_FIXTURE))
    q = """
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    PREFIX c: <https://ex.org/concepts/>
    SELECT ?concept ?label WHERE {
        c:qft skos:broader{1,2} ?concept .
        ?concept skos:prefLabel ?label
    }
    """
    return sparql_select(triples, q).orderBy("concept", "label")
