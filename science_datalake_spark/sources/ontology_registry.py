"""Declarative ontology registry: one entry per ontology with format,
parser, id-prefix and provenance metadata, plus a single ``convert``
dispatch — so all 13 ontologies flow through the same code path.

Reference parallel: scripts/ontology_registry.py:1-225 (the registry) and
convert_ontologies.py's per-parser dispatch. The acquisition layer
(download URLs, retries, extraction) is intentionally out of scope in
this sandbox — entries record the public ``source_url`` for provenance
and the expected local ``filename``; a deployment wires its own fetch
(the reference's download_ontologies.py) and calls :func:`convert` on the
file contents.

Parser keys map to the dependency-free converters in this package:

- ``obo``      → sources.ontology.obo_to_tables
- ``skos``     → sources.ontology.skos_to_tables (nt/ttl/rdf/owl)
- ``msc_csv``  → sources.ontology_csv.msc_csv_to_tables
- ``cso_csv``  → sources.ontology_csv.cso_csv_to_tables

(The reference's ``mesh_nt`` specialization is the SKOS walk over
N-Triples plus MeSH-vocab extras; here MeSH routes through ``skos`` with
format ``nt`` — labels/hierarchy/xrefs land identically.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from science_datalake_spark.sources.ontology import (
    OntologyTables,
    obo_to_tables,
    skos_to_tables,
)
from science_datalake_spark.sources.ontology_csv import (
    cso_csv_to_tables,
    msc_csv_to_tables,
)


@dataclass(frozen=True)
class OntologySpec:
    name: str
    full_name: str
    domain: str
    license: str
    source_url: str  # homepage (provenance/attribution, NOT fetchable data)
    filename: str
    format: str  # obo | nt | ttl | rdf | owl | csv | cso_csv
    parser: str  # obo | skos | msc_csv | cso_csv
    estimated_terms: int
    id_prefix: str
    #: direct data-file URL the acquisition manifest fetches (the
    #: reference registry's download.url); empty = manual download
    #: (portal login), e.g. CSO. ``filename`` is the AS-FETCHED name —
    #: archive entries (.zip/.gz) keep their archive extension, and the
    #: deployment's fetch pipeline extracts before convert() (the
    #: reference's download 'extract' step)
    download_url: str = ""


#: The reference's 13 ontologies (ontology_registry.py:13-225).
ONTOLOGIES: dict[str, OntologySpec] = {
    spec.name: spec
    for spec in [
        OntologySpec(
            "mesh", "Medical Subject Headings", "Biomedical", "Public Domain",
            "https://www.nlm.nih.gov/mesh/", "mesh.nt.gz", "nt", "skos",
            30000, "http://id.nlm.nih.gov/mesh/",
            download_url="https://nlmpubs.nlm.nih.gov/projects/mesh/rdf/mesh.nt.gz",
        ),
        OntologySpec(
            "go", "Gene Ontology", "Biology", "CC BY 4.0",
            "http://geneontology.org/", "go-basic.obo", "obo", "obo",
            45000, "GO:",
            download_url="https://purl.obolibrary.org/obo/go/go-basic.obo",
        ),
        OntologySpec(
            "doid", "Disease Ontology", "Disease", "CC0",
            "https://disease-ontology.org/", "doid.obo", "obo", "obo",
            12000, "DOID:",
            download_url="http://purl.obolibrary.org/obo/doid.obo",
        ),
        OntologySpec(
            "chebi", "Chemical Entities of Biological Interest", "Chemistry",
            "CC BY 4.0", "https://www.ebi.ac.uk/chebi/", "chebi.obo", "obo",
            "obo", 195000, "CHEBI:",
            download_url="http://purl.obolibrary.org/obo/chebi.obo",
        ),
        OntologySpec(
            "hpo", "Human Phenotype Ontology", "Phenotypes",
            "Custom (free for research)", "https://hpo.jax.org/", "hp.obo",
            "obo", "obo", 18000, "HP:",
            download_url="http://purl.obolibrary.org/obo/hp.obo",
        ),
        OntologySpec(
            "ncit", "NCI Thesaurus", "Cancer/Biomedical", "CC BY 4.0",
            "https://ncithesaurus.nci.nih.gov/", "ncit.obo", "obo", "obo",
            160000, "NCIT:",
            download_url="http://purl.obolibrary.org/obo/ncit.obo",
        ),
        OntologySpec(
            "edam", "EDAM Ontology", "Bioinformatics", "CC BY 4.0",
            "https://edamontology.org/", "EDAM.owl", "owl", "skos",
            3000, "http://edamontology.org/",
            download_url="http://edamontology.org/EDAM.owl",
        ),
        OntologySpec(
            "physh", "Physics Subject Headings", "Physics", "CC BY 4.0",
            "https://physh.org/", "physh.ttl", "ttl", "skos",
            3500, "https://physh.org/concepts/",
            download_url="https://raw.githubusercontent.com/physh-org/PhySH/master/physh.ttl",
        ),
        OntologySpec(
            "msc2020", "Mathematics Subject Classification 2020", "Mathematics",
            "CC BY-NC-SA 4.0", "https://msc2020.org/", "MSC_2020.csv", "csv",
            "msc_csv", 6500, "MSC:",
            download_url="https://msc2020.org/MSC_2020.csv",
        ),
        OntologySpec(
            "agrovoc", "AGROVOC Multilingual Thesaurus", "Agriculture",
            "CC BY 3.0 IGO", "https://agrovoc.fao.org/", "agrovoc_core.nt.zip",
            "nt", "skos", 42000, "http://aims.fao.org/aos/agrovoc/",
            download_url="https://agrovoc.fao.org/latestAgrovoc/agrovoc_core.nt.zip",
        ),
        OntologySpec(
            "unesco", "UNESCO Thesaurus", "General Science / Education",
            "CC BY-SA 3.0 IGO", "https://vocabularies.unesco.org/",
            "unesco-thesaurus.rdf", "rdf", "skos",
            4400, "http://vocabularies.unesco.org/thesaurus/",
            download_url="https://vocabularies.unesco.org/exports/thesaurus/latest/unesco-thesaurus.rdf",
        ),
        OntologySpec(
            "stw", "STW Thesaurus for Economics", "Economics", "CC BY 4.0",
            "https://zbw.eu/stw/", "stw.rdf.zip", "rdf", "skos",
            6000, "http://zbw.eu/stw/descriptor/",
            download_url="https://zbw.eu/stw/version/latest/download/stw.rdf.zip",
        ),
        OntologySpec(
            "cso", "Computer Science Ontology", "Computer Science", "CC BY 4.0",
            "https://cso.kmi.open.ac.uk/", "CSO.3.5.csv", "cso_csv", "cso_csv",
            14000, "https://cso.kmi.open.ac.uk/topics/",
            download_url="",
        ),
    ]
}

ALL_ONTOLOGY_NAMES = list(ONTOLOGIES)


def convert(spark: SparkSession, name: str, text: str) -> OntologyTables:
    """Registry-driven dispatch: route ``text`` through the parser the
    registry declares for ``name`` (convert_ontologies.py's per-format
    export_parquet_* switch, as one function)."""
    try:
        spec = ONTOLOGIES[name]
    except KeyError:
        raise ValueError(f"unknown ontology {name!r}; known: {ALL_ONTOLOGY_NAMES}")
    if spec.parser == "obo":
        return obo_to_tables(spark, text)
    if spec.parser == "skos":
        return skos_to_tables(spark, text, fmt=spec.format)
    if spec.parser == "msc_csv":
        return msc_csv_to_tables(spark, text)
    if spec.parser == "cso_csv":
        return cso_csv_to_tables(spark, text)
    raise ValueError(f"unhandled parser {spec.parser!r} for {name!r}")
