"""The reference's OpenAlex entity-config set re-expressed as declarative
EntitySpecs over sources/extraction.py.

Reference parallel: ``convert_openalex.py`` drives its whole OpenAlex ETL
from per-entity SQL configs — 9 simple entities (``SIMPLE_ENTITY_CONFIGS``,
convert_openalex.py:155-388), authors main+2 sub-tables (:392-430), and
works main+12 sub-tables (``WORKS_MAIN_SQL``/``WORKS_SUBTABLE_SQLS``,
:435-577). Porting the datalake to this engine means THESE configs, not
hand-written converters: every entry is a ColumnSpec list (try_cast
tolerance), an optional explode (LATERAL UNNEST), and a WHERE — the
machinery (`extract_battery`) is generic and map-only.

Column inventories follow the reference configs; names/types are the
public OpenAlex snapshot data model (SURVEY §1.2). Struct access uses
dotted exprs (``ids.openalex``); the JSON-opaque columns the reference
keeps as JSON (works ``ids``) are extracted with ``get_json_object``
over ``to_json`` — this expects the PARSED (struct) shape the NDJSON
reader produces. A source that kept ``ids`` as a raw JSON string should
either parse it first (``from_json``) or swap the spec's expr to
``get_json_object(ids, ...)`` directly; one expression cannot serve both
physical types.

Scale: identical to the generic battery — each sub-table is an
independent column-pruned, map-only projection of the same NDJSON/Parquet
scan; nothing here shuffles.
"""

from __future__ import annotations

from science_datalake_spark.sources.extraction import ColumnSpec as C
from science_datalake_spark.sources.extraction import EntitySpec

# --- shared column groups ---------------------------------------------------

_IDS_WIKI = (
    C("openalex_id", "ids.openalex"),
    C("wikidata_id", "ids.wikidata"),
    C("wikipedia_url", "ids.wikipedia"),
)
_DATES = (
    C("updated_date", "updated_date"),
    C("created_date", "created_date"),
)
_COUNTS = (
    C("works_count", "works_count", "bigint"),
    C("cited_by_count", "cited_by_count", "bigint"),
)
_SUMMARY_STATS = (
    C("mean_citedness_2yr", "summary_stats.`2yr_mean_citedness`", "double"),
    C("h_index", "summary_stats.h_index", "bigint"),
    C("i10_index", "summary_stats.i10_index", "bigint"),
)


def _simple(name: str, *extra: C) -> EntitySpec:
    return EntitySpec(
        name=name,
        columns=(
            C("id", "id"),
            C("display_name", "display_name"),
            *extra,
            *_COUNTS,
            *_DATES,
        ),
    )


# --- 9 simple entities (convert_openalex.py:155-388) ------------------------

SIMPLE_ENTITY_SPECS: dict[str, EntitySpec] = {
    "domains": _simple(
        "domains",
        C("original_id", "original_id", "bigint"),
        C("description", "description"),
        C("display_name_alternatives", "display_name_alternatives", "array<string>"),
        *_IDS_WIKI,
    ),
    "fields": _simple(
        "fields",
        C("original_id", "original_id", "bigint"),
        C("description", "description"),
        C("display_name_alternatives", "display_name_alternatives", "array<string>"),
        C("domain_id", "domain.id"),
        C("domain_display_name", "domain.display_name"),
        *_IDS_WIKI,
    ),
    "subfields": _simple(
        "subfields",
        C("original_id", "original_id", "bigint"),
        C("description", "description"),
        C("display_name_alternatives", "display_name_alternatives", "array<string>"),
        C("field_id", "field.id"),
        C("field_display_name", "field.display_name"),
        C("domain_id", "domain.id"),
        C("domain_display_name", "domain.display_name"),
        *_IDS_WIKI,
    ),
    "topics": _simple(
        "topics",
        C("original_id", "original_id", "bigint"),
        C("description", "description"),
        C("keywords", "keywords", "array<string>"),
        C("subfield_id", "subfield.id"),
        C("subfield_display_name", "subfield.display_name"),
        C("field_id", "field.id"),
        C("field_display_name", "field.display_name"),
        C("domain_id", "domain.id"),
        C("domain_display_name", "domain.display_name"),
        C("openalex_id", "ids.openalex"),
        C("wikipedia_url", "ids.wikipedia"),
    ),
    "publishers": _simple(
        "publishers",
        C("alternate_titles", "alternate_titles", "array<string>"),
        C("country_codes", "country_codes", "array<string>"),
        C("lineage", "lineage", "array<string>"),
        C("openalex_id", "ids.openalex"),
        C("ror_id", "ids.ror"),
        C("wikidata_id", "ids.wikidata"),
        C("homepage_url", "homepage_url"),
        *_SUMMARY_STATS,
    ),
    "funders": _simple(
        "funders",
        C("alternate_titles", "alternate_titles", "array<string>"),
        C("country_code", "country_code"),
        C("description", "description"),
        C("openalex_id", "ids.openalex"),
        C("ror_id", "ids.ror"),
        C("wikidata_id", "ids.wikidata"),
        C("grants_count", "grants_count", "bigint"),
        *_SUMMARY_STATS,
    ),
    "sources": _simple(
        "sources",
        C("abbreviated_title", "abbreviated_title"),
        C("issn_l", "issn_l"),
        C("issn", "issn", "array<string>"),
        C("is_oa", "is_oa", "boolean"),
        C("is_in_doaj", "is_in_doaj", "boolean"),
        C("host_organization", "host_organization"),
        C("host_organization_name", "host_organization_name"),
        C("type", "type"),
        C("country_code", "country_code"),
        C("homepage_url", "homepage_url"),
        C("openalex_id", "ids.openalex"),
        *_SUMMARY_STATS,
    ),
    "institutions": _simple(
        "institutions",
        C("ror", "ror"),
        C("country_code", "country_code"),
        C("type", "type"),
        C("homepage_url", "homepage_url"),
        C("display_name_alternatives", "display_name_alternatives", "array<string>"),
        C("latitude", "geo.latitude", "double"),
        C("longitude", "geo.longitude", "double"),
        C("city", "geo.city"),
        C("country", "geo.country"),
        C("openalex_id", "ids.openalex"),
        C("ror_id", "ids.ror"),
        C("wikidata_id", "ids.wikidata"),
        *_SUMMARY_STATS,
    ),
    "concepts": _simple(
        "concepts",
        C("wikidata", "wikidata"),
        C("level", "level", "int"),
        C("description", "description"),
        C("openalex_id", "ids.openalex"),
        C("wikidata_id", "ids.wikidata"),
        C("wikipedia_url", "ids.wikipedia"),
    ),
}

# --- authors: main + 2 sub-tables (convert_openalex.py:392-430) -------------

AUTHORS_MAIN_SPEC = EntitySpec(
    name="authors",
    columns=(
        C("id", "id"),
        C("orcid", "orcid"),
        C("display_name", "display_name"),
        C("display_name_alternatives", "display_name_alternatives", "array<string>"),
        *_COUNTS,
        *_SUMMARY_STATS,
        C("last_known_institutions", "to_json(last_known_institutions)"),
        C("openalex_id", "ids.openalex"),
        C("orcid_url", "ids.orcid"),
        *_DATES,
    ),
)

AUTHORS_SUBTABLE_SPECS: dict[str, EntitySpec] = {
    "authors_ids": EntitySpec(
        name="authors_ids",
        where="ids IS NOT NULL",
        columns=(
            C("author_id", "id"),
            C("openalex", "ids.openalex"),
            C("orcid", "ids.orcid"),
            C("orcid_top", "orcid"),
        ),
    ),
    "authors_counts_by_year": EntitySpec(
        name="authors_counts_by_year",
        explode="counts_by_year",
        alias="c",
        columns=(
            C("author_id", "id"),
            C("year", "c.year", "int"),
            C("works_count", "c.works_count", "bigint"),
            C("oa_works_count", "c.oa_works_count", "bigint"),
            C("cited_by_count", "c.cited_by_count", "bigint"),
        ),
    ),
}

# --- works: main + 12 sub-tables (convert_openalex.py:435-577) --------------

WORKS_MAIN_SPEC = EntitySpec(
    name="works",
    columns=(
        C("id", "id"),
        C("doi", "doi"),
        C("title", "title"),
        C("display_name", "display_name"),
        C("publication_year", "publication_year", "int"),
        C("publication_date", "publication_date"),
        C("language", "language"),
        C("type", "type"),
        C("cited_by_count", "cited_by_count", "bigint"),
        C("fwci", "fwci", "double"),
        C("is_retracted", "is_retracted", "boolean"),
        C("is_paratext", "is_paratext", "boolean"),
        C("has_fulltext", "has_fulltext", "boolean"),
        C("abstract", "abstract"),
        C("referenced_works_count", "referenced_works_count", "bigint"),
        *_DATES,
    ),
)

WORKS_SUBTABLE_SPECS: dict[str, EntitySpec] = {
    "works_authorships": EntitySpec(
        name="works_authorships",
        explode="authorships",
        alias="a",
        columns=(
            C("work_id", "id"),
            C("author_id", "a.author.id"),
            C("author_display_name", "a.author.display_name"),
            C("author_orcid", "a.author.orcid"),
            C("raw_author_name", "a.raw_author_name"),
            C("is_corresponding", "a.is_corresponding", "boolean"),
            C("raw_affiliation_strings", "a.raw_affiliation_strings", "array<string>"),
            C("institutions", "to_json(a.institutions)"),
            C("countries", "a.countries", "array<string>"),
        ),
    ),
    "works_topics": EntitySpec(
        name="works_topics",
        explode="topics",
        alias="tp",
        columns=(
            C("work_id", "id"),
            C("topic_id", "tp.id"),
            C("topic_display_name", "tp.display_name"),
            C("score", "tp.score", "double"),
        ),
    ),
    "works_referenced_works": EntitySpec(
        name="works_referenced_works",
        explode="referenced_works",
        alias="rw",
        columns=(C("work_id", "id"), C("referenced_work_id", "rw")),
    ),
    "works_related_works": EntitySpec(
        name="works_related_works",
        explode="related_works",
        alias="rw",
        columns=(C("work_id", "id"), C("related_work_id", "rw")),
    ),
    "works_locations": EntitySpec(
        name="works_locations",
        explode="locations",
        alias="loc",
        columns=(
            C("work_id", "id"),
            C("source_id", "loc.source.id"),
            C("source_display_name", "loc.source.display_name"),
            C("pdf_url", "loc.pdf_url"),
            C("landing_page_url", "loc.landing_page_url"),
            C("is_oa", "loc.is_oa", "boolean"),
            C("license", "loc.license"),
            C("version", "loc.version"),
        ),
    ),
    "works_ids": EntitySpec(
        name="works_ids",
        where="ids IS NOT NULL",
        columns=(
            C("work_id", "id"),
            C("openalex", "get_json_object(to_json(ids), '$.openalex')"),
            C("doi", "get_json_object(to_json(ids), '$.doi')"),
            C("pmid", "get_json_object(to_json(ids), '$.pmid')"),
            C("mag", "get_json_object(to_json(ids), '$.mag')"),
        ),
    ),
    "works_open_access": EntitySpec(
        name="works_open_access",
        where="open_access IS NOT NULL",
        columns=(
            C("work_id", "id"),
            C("is_oa", "open_access.is_oa", "boolean"),
            C("oa_status", "open_access.oa_status"),
            C("oa_url", "open_access.oa_url"),
            C(
                "any_repository_has_fulltext",
                "open_access.any_repository_has_fulltext",
                "boolean",
            ),
        ),
    ),
    "works_biblio": EntitySpec(
        name="works_biblio",
        where="biblio IS NOT NULL",
        columns=(
            C("work_id", "id"),
            C("volume", "biblio.volume"),
            C("issue", "biblio.issue"),
            C("first_page", "biblio.first_page"),
            C("last_page", "biblio.last_page"),
        ),
    ),
    "works_counts_by_year": EntitySpec(
        name="works_counts_by_year",
        explode="counts_by_year",
        alias="c",
        columns=(
            C("work_id", "id"),
            C("year", "c.year", "int"),
            C("cited_by_count", "c.cited_by_count", "bigint"),
        ),
    ),
    "works_best_oa_location": EntitySpec(
        name="works_best_oa_location",
        where="best_oa_location IS NOT NULL",
        columns=(
            C("work_id", "id"),
            C("source_id", "best_oa_location.source.id"),
            C("pdf_url", "best_oa_location.pdf_url"),
            C("landing_page_url", "best_oa_location.landing_page_url"),
            C("is_oa", "best_oa_location.is_oa", "boolean"),
            C("license", "best_oa_location.license"),
            C("version", "best_oa_location.version"),
        ),
    ),
    "works_concepts": EntitySpec(
        name="works_concepts",
        explode="concepts",
        alias="c",
        columns=(
            C("work_id", "id"),
            C("concept_id", "c.id"),
            C("display_name", "c.display_name"),
            C("level", "c.level", "int"),
            C("score", "c.score", "double"),
        ),
    ),
    "works_keywords": EntitySpec(
        name="works_keywords",
        explode="keywords",
        alias="kw",
        columns=(
            C("work_id", "id"),
            C("keyword_id", "kw.id"),
            C("display_name", "kw.display_name"),
            C("score", "kw.score", "double"),
        ),
    ),
}

#: Works-source columns older snapshot shards may lack (schema-evolution
#: padding — convert_openalex.py:591-604's ensure_source_columns set).
WORKS_ENSURE_DDL = (
    "id STRING, doi STRING, title STRING, display_name STRING, "
    "publication_year STRING, publication_date STRING, language STRING, "
    "type STRING, cited_by_count STRING, fwci STRING, is_retracted STRING, "
    "is_paratext STRING, has_fulltext STRING, abstract STRING, "
    "referenced_works_count STRING, updated_date STRING, created_date STRING, "
    "authorships ARRAY<STRUCT<author: STRUCT<id: STRING, display_name: STRING, "
    "orcid: STRING>, raw_author_name: STRING, is_corresponding: BOOLEAN, "
    "raw_affiliation_strings: ARRAY<STRING>, institutions: ARRAY<STRUCT<id: STRING>>, "
    "countries: ARRAY<STRING>>>, "
    "topics ARRAY<STRUCT<id: STRING, display_name: STRING, score: DOUBLE>>, "
    "referenced_works ARRAY<STRING>, related_works ARRAY<STRING>, "
    "locations ARRAY<STRUCT<source: STRUCT<id: STRING, display_name: STRING>, "
    "pdf_url: STRING, landing_page_url: STRING, is_oa: BOOLEAN, license: STRING, "
    "version: STRING>>, "
    "ids STRUCT<openalex: STRING, doi: STRING, pmid: STRING, mag: STRING>, "
    "open_access STRUCT<is_oa: BOOLEAN, oa_status: STRING, oa_url: STRING, "
    "any_repository_has_fulltext: BOOLEAN>, "
    "biblio STRUCT<volume: STRING, issue: STRING, first_page: STRING, "
    "last_page: STRING>, "
    "counts_by_year ARRAY<STRUCT<year: INT, cited_by_count: BIGINT, "
    "works_count: BIGINT, oa_works_count: BIGINT>>, "
    "best_oa_location STRUCT<source: STRUCT<id: STRING>, pdf_url: STRING, "
    "landing_page_url: STRING, is_oa: BOOLEAN, license: STRING, version: STRING>, "
    "concepts ARRAY<STRUCT<id: STRING, display_name: STRING, level: INT, "
    "score: DOUBLE>>, "
    "keywords ARRAY<STRUCT<id: STRING, display_name: STRING, score: DOUBLE>>"
)


def works_battery() -> dict[str, EntitySpec]:
    """Main + all 12 sub-tables — one config, 13 outputs per works scan."""
    return {"works": WORKS_MAIN_SPEC, **WORKS_SUBTABLE_SPECS}


def authors_battery() -> dict[str, EntitySpec]:
    return {"authors": AUTHORS_MAIN_SPEC, **AUTHORS_SUBTABLE_SPECS}
