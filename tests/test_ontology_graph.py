"""Ontology converters (OBO / N-Triples), graph traversal, alignment
pipeline + evaluation harness — the full linkage slice end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F

from science_datalake_spark.evaluation import evaluate_alignment
from science_datalake_spark.operators.graph import (
    cooccurrence,
    degrees,
    k_hop,
    transitive_closure,
)
from science_datalake_spark.operators.linkage import fuzzy_label_join
from science_datalake_spark.sources.ontology import (
    ntriples_to_tables,
    obo_to_tables,
    parse_rdf_xml,
    parse_turtle,
    skos_to_tables,
)

OBO_SAMPLE = """format-version: 1.2
ontology: toy

[Term]
id: TOY:0001
name: machine learning
def: "Learning from data" [ref:1]
synonym: "ML" EXACT []
namespace: cs
xref: UMLS:C0376284
xref: MESH:D000069550

[Term]
id: TOY:0002
name: deep learning
is_a: TOY:0001 ! machine learning
xref: UMLS:C4264611

[Term]
id: TOY:0003
name: convolutional networks
is_a: TOY:0002
relationship: part_of TOY:0001

[Term]
id: TOY:0004
name: obsolete thing
is_obsolete: true

[Typedef]
id: part_of
name: part of
"""

NT_SAMPLE = """
<http://ex.org/t1> <http://www.w3.org/2004/02/skos/core#prefLabel> "machine learning"@en .
<http://ex.org/t1> <http://www.w3.org/2004/02/skos/core#prefLabel> "apprentissage"@fr .
<http://ex.org/t1> <http://www.w3.org/2004/02/skos/core#altLabel> "ML"@en .
<http://ex.org/t2> <http://www.w3.org/2004/02/skos/core#prefLabel> "deep learning"@en .
<http://ex.org/t2> <http://www.w3.org/2004/02/skos/core#broader> <http://ex.org/t1> .
<http://ex.org/t2> <http://www.w3.org/2004/02/skos/core#exactMatch> <http://umls.org/C4264611> .
# comment line
malformed line that should be skipped
"""


def test_obo_parser_tables(spark):
    t = obo_to_tables(spark, OBO_SAMPLE)
    terms = {r["id"]: r for r in t.terms.collect()}
    assert set(terms) == {"TOY:0001", "TOY:0002", "TOY:0003", "TOY:0004"}
    assert terms["TOY:0001"]["label"] == "machine learning"
    assert terms["TOY:0001"]["synonyms"] == ["ML"]
    assert terms["TOY:0001"]["definition"] == "Learning from data"
    assert terms["TOY:0004"]["obsolete"] is True
    hier = {(r["parent_id"], r["child_id"], r["relation"]) for r in t.hierarchy.collect()}
    assert ("TOY:0001", "TOY:0002", "is_a") in hier
    assert ("TOY:0001", "TOY:0003", "part_of") in hier
    xr = {(r["term_id"], r["xref_db"], r["xref_id"]) for r in t.xrefs.collect()}
    assert ("TOY:0001", "UMLS", "C0376284") in xr


def test_ntriples_parser_tables(spark):
    t = ntriples_to_tables(spark, NT_SAMPLE)
    terms = {r["id"]: r for r in t.terms.collect()}
    assert terms["http://ex.org/t1"]["label"] == "machine learning"  # @en wins
    assert terms["http://ex.org/t1"]["synonyms"] == ["ML"]
    hier = t.hierarchy.collect()
    assert [(r["parent_id"], r["child_id"]) for r in hier] == [
        ("http://ex.org/t1", "http://ex.org/t2")
    ]
    assert t.xrefs.count() == 1


TTL_SAMPLE = """
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix ex: <http://ex.org/> .

# comment line
ex:t1 a skos:Concept ;
    skos:prefLabel "apprentissage"@fr , "machine learning"@en ;
    skos:altLabel "ML"@en ;
    skos:definition "Learning from data"@en .

ex:t2 a skos:Concept ;
    skos:prefLabel "deep learning"@en ;
    skos:broader ex:t1 ;
    skos:narrower ex:t3 ;
    skos:exactMatch <http://umls.org/C4264611> ;
    skos:related [ skos:prefLabel "anon"@en ] .

ex:t3 skos:prefLabel "convnets"@en .
"""

RDFXML_SAMPLE = """<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#">
  <skos:Concept rdf:about="http://ex.org/t1">
    <skos:prefLabel xml:lang="fr">apprentissage</skos:prefLabel>
    <skos:prefLabel xml:lang="en">machine learning</skos:prefLabel>
    <skos:altLabel xml:lang="en">ML</skos:altLabel>
  </skos:Concept>
  <rdf:Description rdf:about="http://ex.org/t2">
    <rdf:type rdf:resource="http://www.w3.org/2004/02/skos/core#Concept"/>
    <skos:prefLabel xml:lang="en">deep learning</skos:prefLabel>
    <skos:broader rdf:resource="http://ex.org/t1"/>
    <skos:exactMatch rdf:resource="http://umls.org/C4264611"/>
    <skos:narrower>
      <skos:Concept rdf:about="http://ex.org/t3">
        <skos:prefLabel xml:lang="en">convnets</skos:prefLabel>
      </skos:Concept>
    </skos:narrower>
  </rdf:Description>
</rdf:RDF>
"""


def _assert_skos_tables(t):
    """Shared assertions: all three serializations must walk identically."""
    terms = {r["id"]: r for r in t.terms.collect()}
    assert terms["http://ex.org/t1"]["label"] == "machine learning"  # @en beats @fr
    assert terms["http://ex.org/t1"]["synonyms"] == ["ML"]
    hier = {(r["parent_id"], r["child_id"], r["relation"]) for r in t.hierarchy.collect()}
    assert ("http://ex.org/t1", "http://ex.org/t2", "broader") in hier
    assert ("http://ex.org/t2", "http://ex.org/t3", "narrower") in hier
    xr = {(r["term_id"], r["xref_db"], r["xref_id"]) for r in t.xrefs.collect()}
    assert ("http://ex.org/t2", "exactMatch", "http://umls.org/C4264611") in xr


def test_skos_turtle_tables(spark):
    t = skos_to_tables(spark, TTL_SAMPLE, fmt="ttl")
    _assert_skos_tables(t)
    terms = {r["id"]: r for r in t.terms.collect()}
    assert terms["http://ex.org/t1"]["definition"] == "Learning from data"
    assert not any(i.startswith("_:") for i in terms)  # bnodes excluded


def test_skos_rdfxml_tables(spark):
    t = skos_to_tables(spark, RDFXML_SAMPLE, fmt="rdf")
    _assert_skos_tables(t)


def test_turtle_dot_terminator_without_space():
    """'c:physics.' — PN_LOCAL cannot end with '.', so the trailing dot
    terminates the statement (round-2 review: the tokenizer used to
    swallow it into the IRI and merge statements)."""
    quads = parse_turtle(
        "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
        "@prefix ex: <http://ex.org/> .\n"
        "ex:quantum skos:broader ex:physics.\n"
        "ex:optics skos:broader ex:physics.\n"
    )
    broader = [(s, o) for s, p, o, _ in quads if p.endswith("broader")]
    assert broader == [
        ("http://ex.org/quantum", "http://ex.org/physics"),
        ("http://ex.org/optics", "http://ex.org/physics"),
    ]
    # internal dots in locals still belong to the name
    quads2 = parse_turtle(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:v1.2 <http://ex.org/p> ex:v1.3 .\n"
    )
    assert ("http://ex.org/v1.2", "http://ex.org/p", "http://ex.org/v1.3", None) in quads2


def test_skos_foreign_only_label_fallback(spark):
    """Exact reference rule ('if lang == en or not label'): en replaces
    anything; otherwise the FIRST label seen wins, tagged or not."""
    t = ntriples_to_tables(
        spark,
        '<http://ex.org/x> <http://www.w3.org/2004/02/skos/core#prefLabel> "seulement"@fr .\n'
        '<http://ex.org/y> <http://www.w3.org/2004/02/skos/core#prefLabel> "nur"@de .\n'
        '<http://ex.org/y> <http://www.w3.org/2004/02/skos/core#prefLabel> "english"@en .\n'
        '<http://ex.org/z> <http://www.w3.org/2004/02/skos/core#prefLabel> "erst"@de .\n'
        '<http://ex.org/z> <http://www.w3.org/2004/02/skos/core#prefLabel> "untagged" .\n',
    )
    terms = {r["id"]: r["label"] for r in t.terms.collect()}
    assert terms["http://ex.org/x"] == "seulement"  # fallback, not NULL
    assert terms["http://ex.org/y"] == "english"  # en still wins
    assert terms["http://ex.org/z"] == "erst"  # first-seen wins over untagged


def test_turtle_parser_quads():
    quads = parse_turtle(TTL_SAMPLE)
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    skos_concept = "http://www.w3.org/2004/02/skos/core#Concept"
    assert ("http://ex.org/t1", rdf_type, skos_concept, None) in quads
    # comma-list fans out to two prefLabel quads with distinct lang tags
    pls = [q for q in quads if q[0] == "http://ex.org/t1" and q[1].endswith("prefLabel")]
    assert {(q[2], q[3]) for q in pls} == {
        ("apprentissage", "fr"),
        ("machine learning", "en"),
    }


def test_rdfxml_parser_nested_nodes():
    quads = parse_rdf_xml(RDFXML_SAMPLE)
    # nested node element contributes both the link quad and its own labels
    assert ("http://ex.org/t2", "http://www.w3.org/2004/02/skos/core#narrower",
            "http://ex.org/t3", None) in quads
    assert ("http://ex.org/t3", "http://www.w3.org/2004/02/skos/core#prefLabel",
            "convnets", "en") in quads


MSC_SAMPLE = "\t".join(["Code", "Label", "Description"]) + "\n" + "\n".join(
    [
        "68\tComputer science\tGeneral CS",
        "68T\tArtificial intelligence\t",
        "68T05\tLearning and adaptive systems\tML proper",
        "68T07\tArtificial neural networks\t",
        "03\tMathematical logic\t",
    ]
)

CSO_SAMPLE = "\n".join(
    [
        '<https://cso.kmi.open.ac.uk/topics/machine_learning>,<http://www.w3.org/2000/01/rdf-schema#label>,"machine learning@en"',
        "<https://cso.kmi.open.ac.uk/topics/machine_learning>,<http://cso.kmi.open.ac.uk/schema/cso#superTopicOf>,<https://cso.kmi.open.ac.uk/topics/deep_learning>",
        "<https://cso.kmi.open.ac.uk/topics/neural_nets>,<http://cso.kmi.open.ac.uk/schema/cso#contributesTo>,<https://cso.kmi.open.ac.uk/topics/deep_learning>",
        "<https://cso.kmi.open.ac.uk/topics/machine_learning>,<http://cso.kmi.open.ac.uk/schema/cso#relatedEquivalent>,<https://cso.kmi.open.ac.uk/topics/ml%20systems>",
        "<https://cso.kmi.open.ac.uk/topics/machine_learning>,<http://schema.org/relatedLink>,<https://www.wikidata.org/entity/Q2539>",
        "<https://cso.kmi.open.ac.uk/topics/machine_learning>,<http://www.w3.org/2002/07/owl#sameAs>,<http://dbpedia.org/resource/Machine_learning>",
        "malformed row",
    ]
)


def test_msc_csv_prefix_hierarchy(spark):
    """MSC code-structure hierarchy: 5-char -> 3-char -> 2-char prefixes
    (convert_ontologies.py:578-590)."""
    from science_datalake_spark.sources.ontology_csv import msc_csv_to_tables

    t = msc_csv_to_tables(spark, MSC_SAMPLE)
    terms = {r["id"]: r for r in t.terms.collect()}
    assert terms["MSC:68T05"]["label"] == "Learning and adaptive systems"
    assert terms["MSC:68T05"]["definition"] == "ML proper"
    assert terms["MSC:68T05"]["namespace"] == "level_5"
    assert terms["MSC:68"]["namespace"] == "level_2"
    hier = {(r["parent_id"], r["child_id"]) for r in t.hierarchy.collect()}
    assert ("MSC:68T", "MSC:68T05") in hier
    assert ("MSC:68T", "MSC:68T07") in hier
    assert ("MSC:68", "MSC:68T") in hier
    assert not any(c == "MSC:68" for _, c in hier)  # top level has no parent


def test_cso_csv_triples(spark):
    from science_datalake_spark.sources.ontology_csv import cso_csv_to_tables

    t = cso_csv_to_tables(spark, CSO_SAMPLE)
    ml = "https://cso.kmi.open.ac.uk/topics/machine_learning"
    terms = {r["id"]: r for r in t.terms.collect()}
    assert terms[ml]["label"] == "machine learning"  # @en tag stripped
    # synonym label falls back to URI tail, percent-decoded
    assert terms[ml]["synonyms"] == ["ml systems"]
    # un-labelled topics get URI-tail labels
    assert terms["https://cso.kmi.open.ac.uk/topics/deep_learning"]["label"] == "deep learning"
    hier = {(r["parent_id"], r["child_id"], r["relation"]) for r in t.hierarchy.collect()}
    assert (ml, "https://cso.kmi.open.ac.uk/topics/deep_learning", "superTopicOf") in hier
    # contributesTo is inverted: target becomes parent
    assert (
        "https://cso.kmi.open.ac.uk/topics/deep_learning",
        "https://cso.kmi.open.ac.uk/topics/neural_nets",
        "contributesTo",
    ) in hier
    xr = {(r["xref_db"], r["xref_id"]) for r in t.xrefs.collect()}
    assert ("wikidata", "https://www.wikidata.org/entity/Q2539") in xr
    assert ("sameAs", "http://dbpedia.org/resource/Machine_learning") in xr


def test_registry_dispatch(spark):
    """Every registry entry routes to a working parser; spot-check one of
    each parser kind end-to-end."""
    from science_datalake_spark.sources.ontology_registry import (
        ALL_ONTOLOGY_NAMES,
        ONTOLOGIES,
        convert,
    )

    assert len(ALL_ONTOLOGY_NAMES) == 13
    assert {s.parser for s in ONTOLOGIES.values()} == {"obo", "skos", "msc_csv", "cso_csv"}

    assert convert(spark, "go", OBO_SAMPLE).terms.count() == 4
    assert convert(spark, "mesh", NT_SAMPLE).terms.count() >= 2  # nt → skos walk
    assert convert(spark, "physh", TTL_SAMPLE).terms.count() == 3  # ttl → skos walk
    assert convert(spark, "unesco", RDFXML_SAMPLE).terms.count() == 3  # rdf → skos walk
    assert convert(spark, "msc2020", MSC_SAMPLE).terms.count() == 5
    assert convert(spark, "cso", CSO_SAMPLE).hierarchy.count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown ontology"):
        convert(spark, "nope", "")


def test_hierarchy_traversal(spark):
    t = obo_to_tables(spark, OBO_SAMPLE)
    edges = t.hierarchy.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    )
    closure = transitive_closure(edges)
    pairs = {(r["a"], r["d"]) for r in closure.collect()}
    assert ("TOY:0001", "TOY:0003") in pairs  # grandparent via TOY:0002
    deg = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(edges).collect()}
    assert deg["TOY:0001"][0] == 2
    start = spark.createDataFrame([("TOY:0001",)], "node STRING")
    reach = k_hop(edges, start, k=2)
    assert {r["node"] for r in reach.collect()} == {"TOY:0001", "TOY:0002", "TOY:0003"}


def test_alignment_end_to_end_with_eval(spark):
    """OBO terms × topic labels → fuzzy linkage → gold-standard P/R/F1."""
    t = obo_to_tables(spark, OBO_SAMPLE)
    active = t.terms.filter(~F.col("obsolete"))
    topics = spark.createDataFrame(
        [("T1", "machine learning"), ("T2", "deep learnin"), ("T3", "quantum chemistry")],
        "topic_id STRING, display_name STRING",
    )
    matched = fuzzy_label_join(topics, active, "display_name", "label", threshold=0.85)
    out = matched.select(
        F.col("topic_id").alias("left_id"),
        F.col("id").alias("right_id"),
        "similarity",
    )
    got = {(r["left_id"], r["right_id"]) for r in out.collect()}
    assert ("T1", "TOY:0001") in got and ("T2", "TOY:0002") in got
    assert not any(left == "T3" for left, _ in got)

    gold = spark.createDataFrame(
        [
            ("T1", "TOY:0001", True),
            ("T2", "TOY:0002", True),
            ("T3", "TOY:0003", False),
        ],
        "left_id STRING, right_id STRING, is_correct BOOLEAN",
    )
    metrics = evaluate_alignment(out, gold, thresholds=(0.85, 0.99))
    m85 = metrics[0]
    assert m85.precision == 1.0 and m85.recall == 1.0 and m85.f1 == 1.0
    m99 = metrics[1]
    assert m99.recall == 0.5  # the 'deep learnin' typo match (jw≈0.985) drops out


def test_connected_components(spark):
    """Two components + a 4-hop chain (propagation must run to the
    diameter, not stop early)."""
    from science_datalake_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "s"), ("s", "t")],
        "src STRING, dst STRING",
    )
    comp = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x",
        "p": "p", "q": "p", "r": "p", "s": "p", "t": "p",
    }


def test_connected_components_raises_on_non_convergence(spark):
    """Unconverged labels are indistinguishable from converged ones, so
    with the star fallback disabled loop exhaustion must fail loudly, not
    return split components."""
    import pytest as _pytest

    from science_datalake_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "src STRING, dst STRING"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2, fallback_star=False)
    ok = connected_components(chain, max_iters=10)
    assert {r["comp"] for r in ok.collect()} == {"n0"}


def test_connected_components_star_fallback_on_long_chain(spark):
    """A path graph whose diameter exceeds direct-propagation max_iters:
    the default now answers (via star contraction) instead of refusing."""
    from science_datalake_spark.operators.graph import connected_components

    # zero-padded ids so lexicographic min == numeric min
    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(60)], "src STRING, dst STRING"
    )
    out = connected_components(chain, max_iters=5)
    rows = out.collect()
    assert len(rows) == 61
    assert {r["comp"] for r in rows} == {"n000"}


def test_connected_components_star_matches_propagation(spark):
    """Star contraction must produce the identical (node, comp) labeling
    as min-label propagation on a mixed graph: dense blob + chain +
    isolated self-loop + singleton pair."""
    from science_datalake_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [
            # dense blob
            ("b", "a"), ("b", "c"), ("a", "c"), ("c", "d"),
            # 5-chain
            ("p", "q"), ("q", "r"), ("r", "s"), ("s", "t"),
            # pair + self-loop
            ("x", "y"), ("z", "z"),
        ],
        "src STRING, dst STRING",
    )
    prop = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    star = {r["node"]: r["comp"] for r in connected_components_star(edges).collect()}
    assert star == prop
    assert star["z"] == "z" and star["t"] == "p"


def test_connected_components_star_small_graph_gate(spark):
    """The round-14-opt bounded fast path (driver union-find when the
    normalized edge set fits ``small_graph_edges``) must be invisible in
    the results: identical labels at any gate setting, identical
    null-endpoint semantics (dropped, as the comparison filters always
    did), identical schema on non-string ids and on empty input."""
    from science_datalake_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z"), (None, "k"), ("k", None)],
        "src STRING, dst STRING",
    )
    want = {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"), ("z", "z")}
    # normalized distinct edge count here is 4 (null rows drop): thresholds
    # above, exactly at, and below the count, plus disabled
    for gate in (200_000, 4, 3, 1, 0):
        got = {
            (r["node"], r["comp"])
            for r in connected_components_star(edges, small_graph_edges=gate).collect()
        }
        assert got == want, f"small_graph_edges={gate}"

    ints = spark.createDataFrame([(2, 1), (3, 2), (9, 9)], "src LONG, dst LONG")
    fast = connected_components_star(ints)
    slow = connected_components_star(ints, small_graph_edges=0)
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect())) == [
        (1, 1),
        (2, 1),
        (3, 1),
        (9, 9),
    ]

    empty = spark.createDataFrame([], "src STRING, dst STRING")
    out = connected_components_star(empty)
    assert out.count() == 0
    assert out.schema == connected_components_star(empty, small_graph_edges=0).schema


def test_connected_components_cache_flat_across_iterations(spark):
    """The per-iteration localCheckpoint must not accumulate cached RDDs
    (round-3 advice finding): a 60-hop chain needs dozens of rounds, but
    at most the FINAL result's blocks may remain cached afterwards."""
    from science_datalake_spark.operators.graph import connected_components_star

    spark.catalog.clearCache()
    # deterministic baseline: drop every RDD-level cache block (see
    # test_operators.test_dedup_selfjoins_release_input_cache)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in list(jmap.values()):
        rdd.unpersist(True)
    base = spark.sparkContext._jsc.getPersistentRDDs().size()

    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(60)], "src STRING, dst STRING"
    )
    # small_graph_edges=0 forces the distributed rounds — the per-round
    # cache discipline is exactly what this test pins
    out = connected_components_star(chain, small_graph_edges=0)
    assert out.count() == 61
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - base <= 1  # only the live result, never one-per-round


def test_cooccurrence_basic(spark):
    m = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "a"), ("g2", "b")],
        "grp STRING, item STRING",
    )
    pairs = {(r["item_a"], r["item_b"]): r["n_shared"] for r in cooccurrence(m, "grp", "item").collect()}
    assert pairs[("a", "b")] == 2 and pairs[("a", "c")] == 1


def test_cooccurrence_pack_keys_guard(spark):
    """pack_keys=True enforces its id contract loudly: an id >= 2^31 (or
    negative) would overflow/sign-extend into silently collided pairs, so
    the folded assert_true must FAIL the job instead. Valid ids (incl.
    NULLs, dropped by collect_set as on the unpacked layout) match the
    unpacked result exactly."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ok = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", None), ("g2", 1), ("g2", 2)],
        "grp STRING, item INT",
    )
    packed = {
        (r["item_a"], r["item_b"]): r["n_shared"]
        for r in cooccurrence(ok, "grp", "item", pack_keys=True).collect()
    }
    plain = {
        (r["item_a"], r["item_b"]): r["n_shared"]
        for r in cooccurrence(ok, "grp", "item").collect()
    }
    assert packed == plain == {(1, 2): 2}

    for bad_id in (2**31, -5):
        bad = spark.createDataFrame(
            [("g1", 1), ("g1", bad_id)], "grp STRING, item LONG"
        )
        with pytest.raises(SparkRuntimeException, match="2\\^31"):
            cooccurrence(bad, "grp", "item", pack_keys=True).collect()
        # the unpacked layout stays total on the same ids
        assert cooccurrence(bad, "grp", "item").count() == 1


def test_tfidf_vectors_shape(spark, sf_oracle):
    from science_datalake_spark.operators.ranking import tfidf_vectors

    from science_datalake_spark.catalog import table

    d = table(spark, sf_oracle, "documents").limit(50)
    vecs, model = tfidf_vectors(d, "doc_id", "text", num_features=256)
    row = vecs.first()
    assert row["tfidf"].size == 256
    assert vecs.count() == 50


def test_connected_components_star_random_graphs_vs_union_find(spark):
    """Star contraction vs a pure-Python union-find oracle on seeded
    random graphs (sparse, dense, and forest-shaped)."""
    import random

    from science_datalake_spark.operators.graph import connected_components_star

    def union_find_labels(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = component minimum
        comp = {}
        for n in nodes:
            r = find(n)
            comp[n] = min(comp.get(r, r), r)
        roots = {n: find(n) for n in nodes}
        mins = {}
        for n in nodes:
            r = roots[n]
            mins[r] = min(mins.get(r, n), n)
        return {n: mins[roots[n]] for n in nodes}

    for seed, n_nodes, n_edges in [(1, 40, 20), (2, 40, 80), (3, 60, 59)]:
        rng = random.Random(seed)
        edges = [
            (f"n{rng.randrange(n_nodes):03d}", f"n{rng.randrange(n_nodes):03d}")
            for _ in range(n_edges)
        ]
        nodes = sorted({x for e in edges for x in e})
        expected = union_find_labels(edges, nodes)
        df = spark.createDataFrame(edges, "src STRING, dst STRING")
        # distributed rounds forced (the default gate would route these
        # tiny graphs to the driver-side union-find — which this oracle
        # IS, so that comparison would be vacuous)
        got = {
            r["node"]: r["comp"]
            for r in connected_components_star(df, small_graph_edges=0).collect()
        }
        assert got == expected, f"seed={seed}"
        # the bounded fast path must agree with both
        fast = {
            r["node"]: r["comp"] for r in connected_components_star(df).collect()
        }
        assert fast == expected, f"seed={seed} (fast path)"


def test_annotated_stratified_metrics_hand_computed(spark):
    """The round-10 stratified evaluator must reproduce the reference's
    compute_metrics arithmetic (evaluate_ontology_alignment.py:259-326)
    on a hand-computed fixture: per-stratum counts/precision, threshold
    P/R/F1 with the empty-set-zeros convention, and the PR sweep with
    the empty-set (P=1, R=0) curve convention."""
    from science_datalake_spark.evaluation import (
        annotated_pr_curve,
        annotated_stratum_metrics,
        annotated_threshold_metrics,
    )

    rows = [
        # (stratum, similarity, label)
        ("exact", 0.97, "correct"),
        ("exact", 0.96, "correct"),
        ("exact", 0.95, "partial"),
        ("high", 0.90, "correct"),
        ("high", 0.88, "incorrect"),
        ("mid", 0.80, "partial"),
        ("mid", 0.78, "incorrect"),
        ("borderline", 0.70, "correct"),
    ]
    ann = spark.createDataFrame(rows, "stratum STRING, similarity DOUBLE, label STRING")

    strata = {r["stratum"]: r for r in annotated_stratum_metrics(ann).collect()}
    assert strata["exact"]["n"] == 3 and strata["exact"]["n_correct"] == 2
    assert strata["exact"]["n_partial"] == 1 and strata["exact"]["n_incorrect"] == 0
    assert strata["exact"]["precision"] == round(2 / 3, 4)
    assert strata["high"]["precision"] == 0.5
    assert strata["mid"]["precision"] == 0.0
    assert strata["borderline"]["precision"] == 1.0

    # total correct = 4
    thr = {r["threshold"]: r for r in annotated_threshold_metrics(ann).collect()}
    # >= 0.65: all 8 pairs, tp=4 -> P=0.5, R=1.0, F1=2*.5*1/1.5
    assert thr[0.65]["n"] == 8 and thr[0.65]["precision"] == 0.5
    assert thr[0.65]["recall"] == 1.0 and thr[0.65]["f1"] == round(2 * 0.5 / 1.5, 4)
    # >= 0.85: 5 pairs (.97,.96,.95,.90,.88), tp=3 -> P=0.6, R=0.75
    assert thr[0.85]["n"] == 5 and thr[0.85]["precision"] == 0.6
    assert thr[0.85]["recall"] == 0.75
    # >= 0.95: 3 pairs, tp=2
    assert thr[0.95]["n"] == 3 and thr[0.95]["precision"] == round(2 / 3, 4)
    assert thr[0.95]["recall"] == 0.5

    curve = {r["threshold"]: r for r in annotated_pr_curve(ann).collect()}
    assert len(curve) == 41  # 0.60 .. 1.00 inclusive
    # above 0.97 nothing survives -> reference's curve endpoint: P=1, R=0
    assert curve[0.98]["n"] == 0 and curve[0.98]["precision"] == 1.0
    assert curve[0.98]["recall"] == 0.0 and curve[0.98]["f1"] == 0.0
    # at 0.60 everything: same as the 0.65 block here
    assert curve[0.60]["n"] == 8 and curve[0.60]["recall"] == 1.0
    # monotone n
    ns = [curve[t]["n"] for t in sorted(curve)]
    assert ns == sorted(ns, reverse=True)


def test_group_auc_hand_computed_and_vs_pairwise(spark):
    """group_auc: hand-checkable instance with TIES, plus equivalence to
    the O(n_pos*n_neg) pairwise definition
    (#(pos>neg) + 0.5*#(pos==neg)) / (n_pos*n_neg) on seeded random
    groups — the Mann-Whitney midrank identity. Degenerate one-class
    groups return NULL auc; perfect separation returns 1.0."""
    import random

    from science_datalake_spark.evaluation import group_auc

    # g1: scores pos {0.9, 0.5}, neg {0.5, 0.1}:
    # pairs: (.9>.5)+(.9>.1)+(.5==.5 -> .5)+(.5>.1) = 3.5 of 4 -> 0.875
    rows = [
        ("g1", 0.9, 1), ("g1", 0.5, 1), ("g1", 0.5, 0), ("g1", 0.1, 0),
        ("g2", 0.8, 1), ("g2", 0.2, 0),            # perfect -> 1.0
        ("g3", 0.7, 1), ("g3", 0.6, 1),            # one-class -> NULL
        ("g4", None, 1), ("g4", 0.3, None), ("g4", 0.4, 1), ("g4", 0.2, 0),
    ]
    df = spark.createDataFrame(rows, "g STRING, s DOUBLE, y INT")
    got = {r["g"]: (r["n_pos"], r["n_neg"], r["auc"]) for r in group_auc(df, ["g"], "s", "y").collect()}
    assert got["g1"] == (2, 2, 0.875)
    assert got["g2"] == (1, 1, 1.0)
    assert got["g3"] == (2, 0, None)
    assert got["g4"] == (1, 1, 1.0)  # NULL score/label rows excluded

    rng = random.Random(41)
    rnd = [
        (f"r{i % 4}", round(rng.uniform(0, 1), 1), rng.randint(0, 1))
        for i in range(240)
    ]
    rdf = spark.createDataFrame(rnd, "g STRING, s DOUBLE, y INT")
    got = {r["g"]: r["auc"] for r in group_auc(rdf, ["g"], "s", "y").collect()}
    for g in sorted({r[0] for r in rnd}):
        pos = [s for gg, s, y in rnd if gg == g and y == 1]
        neg = [s for gg, s, y in rnd if gg == g and y == 0]
        if not pos or not neg:
            assert got[g] is None
            continue
        num = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
        assert abs(got[g] - num / (len(pos) * len(neg))) < 1e-12, g


def test_calibration_report_hand_computed(spark):
    """Hand-checked bins (n_bins=2): g1 probs/labels chosen so bin 0 =
    {0.2/0, 0.4/1} (conf .3, acc .5, gap .2) and bin 1 = {0.6/1, 1.0/1}
    (conf .8, acc 1.0, gap .2): ece = .2, max_gap = .2, brier =
    (0.04+0.36+0.16+0)/4 = 0.14. p=1.0 clamps into the top bin;
    out-of-range probabilities fail loudly; NULLs excluded."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from science_datalake_spark.evaluation import calibration_report

    rows = [
        ("g1", 0.2, 0), ("g1", 0.4, 1), ("g1", 0.6, 1), ("g1", 1.0, 1),
        ("g1", None, 1), ("g1", 0.5, None),
    ]
    df = spark.createDataFrame(rows, "g STRING, p DOUBLE, y INT")
    r = calibration_report(df, ["g"], "p", "y", n_bins=2).collect()[0]
    assert (r["n"], r["ece"], r["max_gap"], r["brier"]) == (4, 0.2, 0.2, 0.14)

    bad = spark.createDataFrame([("g", 1.5, 1)], "g STRING, p DOUBLE, y INT")
    with pytest.raises(SparkRuntimeException, match="outside"):
        calibration_report(bad, ["g"], "p", "y").collect()


def test_calibration_report_perfect_and_random(spark):
    """A perfectly-calibrated scorer (within-bin accuracy == confidence)
    scores ece ~0; a constant-0.9 scorer on a 50/50 label mix scores
    ece = 0.4 and brier = 0.9^2*.5 + 0.1^2*.5 = 0.41."""
    from science_datalake_spark.evaluation import calibration_report

    # prob 0.25 with exactly 25% positives
    perfect = [("p", 0.25, 1 if i % 4 == 0 else 0) for i in range(400)]
    overconf = [("o", 0.9, i % 2) for i in range(400)]
    df = spark.createDataFrame(
        [(g, p, int(y)) for g, p, y in perfect + overconf],
        "g STRING, p DOUBLE, y INT",
    )
    got = {r["g"]: r for r in calibration_report(df, ["g"], "p", "y").collect()}
    assert got["p"]["ece"] == 0.0 and got["p"]["brier"] == 0.1875
    assert got["o"]["ece"] == 0.4 and got["o"]["brier"] == 0.41


def test_connected_components_star_round_shapes_identical(spark):
    """The window round shape (round-14 default — no per-round broadcast
    future jobs) labels identically to the join shape on every graph
    class: dense blob, long chain, degree-skewed hub star, pair,
    self-loop singleton. Also pins the invalid-shape error."""
    import pytest

    from science_datalake_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("a", "c"), ("c", "d")]
        + [(f"n{i:03d}", f"n{i+1:03d}") for i in range(40)]
        + [("hub", f"leaf{i:02d}") for i in range(50)]
        + [("x", "y"), ("z", "z")],
        "src STRING, dst STRING",
    )
    # small_graph_edges=0 forces the distributed rounds: with the default
    # gate this fixture would take the union-find fast path and never
    # exercise either round shape
    win = sorted(
        map(
            tuple,
            connected_components_star(
                edges, round_shape="window", small_graph_edges=0
            ).collect(),
        )
    )
    jon = sorted(
        map(
            tuple,
            connected_components_star(
                edges, round_shape="join", small_graph_edges=0
            ).collect(),
        )
    )
    assert win == jon and len(win) > 0
    # the bounded fast path (default gate) must label identically to both
    fast = sorted(map(tuple, connected_components_star(edges).collect()))
    assert fast == win
    with pytest.raises(ValueError, match="round_shape"):
        connected_components_star(edges, round_shape="broadcast")


def test_connected_components_star_fast_path_guards(spark, monkeypatch):
    """Round-15 ADVICE guards on the driver union-find tier: (1) the
    fast path is byte-capped, not just row-capped — wide string ids
    above ``small_graph_bytes`` route to the distributed rounds; (2)
    fractional node ids skip the fast path entirely (Python NaN
    comparisons disagree with Spark's NaN-largest ordering), with
    identical labels either way on NaN-free data."""
    from science_datalake_spark.operators import graph as G

    def boom(*a, **k):  # trips if the fast path is taken
        raise AssertionError("fast path must not run")

    wide = spark.createDataFrame(
        [("u" * 200 + str(i), "v" * 200 + str(i % 3)) for i in range(6)],
        "src STRING, dst STRING",
    )
    want = sorted(
        map(tuple, G.connected_components_star(wide, small_graph_edges=0).collect())
    )
    # under the default byte gate this tiny graph IS fast-pathed...
    assert sorted(
        map(tuple, G.connected_components_star(wide).collect())
    ) == want
    # ...but a 100-byte cap routes it to the distributed rounds
    monkeypatch.setattr(G, "_union_find_labels_local", boom)
    assert sorted(
        map(
            tuple,
            G.connected_components_star(wide, small_graph_bytes=100).collect(),
        )
    ) == want

    floats = spark.createDataFrame(
        [(2.0, 1.0), (3.0, 2.0), (9.5, 9.5)], "src DOUBLE, dst DOUBLE"
    )
    # fractional ids never take the fast path (boom still patched)
    got = sorted(map(tuple, G.connected_components_star(floats).collect()))
    assert got == [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (9.5, 9.5)]
    monkeypatch.undo()
    # and the labels equal the forced-distributed ones
    assert got == sorted(
        map(
            tuple,
            G.connected_components_star(floats, small_graph_edges=0).collect(),
        )
    )
