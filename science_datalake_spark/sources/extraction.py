"""Config-driven multi-entity extraction battery: one declarative spec per
output table, many tables from one scan of a nested source.

Reference parallel: ``convert_openalex.py`` drives its whole OpenAlex ETL
from declarative SQL configs — ``SIMPLE_ENTITY_CONFIGS`` (9 entities of
TRY_CAST column lists, convert_openalex.py:155-388) plus main+sub-table
batteries (``WORKS_MAIN_SQL`` / ``WORKS_SUBTABLE_SQLS`` with 12 works
sub-tables built by ``LATERAL UNNEST`` over array columns,
convert_openalex.py:435-577). Porting a new datalake source there means
writing a config, not a converter. This module is the Spark-first
equivalent:

- ``ColumnSpec``: output column = ``try_cast(<expr> AS <type>)`` — the
  reference's TRY_CAST-everywhere tolerance (NULL on malformed input,
  stable under ANSI mode).
- ``EntitySpec``: optional ``explode`` of an array column (the LATERAL
  UNNEST), optional ``where``, optional ``ensure`` DDL naming
  referenced-but-possibly-absent source columns (schema evolution across
  snapshot partitions — ensure_columns pads typed NULLs exactly like the
  reference's ``ensure_source_columns``, convert_openalex.py:591-604).
- ``extract_battery``: {name: spec} → {name: DataFrame}, all specs over
  the SAME source frame.

Scale notes: every extraction is a map-only projection (explode is a
row-generator inside codegen, no shuffle), so a battery of N sub-tables
is N independent column-pruned scans — and because each output prunes to
its own referenced columns, Catalyst reads only the struct fields each
sub-table needs from Parquet. At 100 TB the reference materializes
main+subtables in ONE pass per input file; the Spark equivalent when scan
dominates is ``persist()`` of the parsed source (or one pass writing all
outputs from ``foreachBatch``) — left to the caller, since for
column-pruned Parquet inputs separate scans are usually CHEAPER than
caching the full rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BARE_REF = re.compile(r"^[A-Za-z_]\w*$")
_DOTTED_REF = re.compile(r"^([A-Za-z_]\w*)\.(`[^`]+`|[A-Za-z_]\w*)$")


@dataclass(frozen=True)
class ColumnSpec:
    """One output column: ``try_cast((expr) AS type) AS out``."""

    out: str
    expr: str
    type: str = "string"


@dataclass(frozen=True)
class EntitySpec:
    """One output table derived from the nested source.

    ``explode``: array column (or array expression) to UNNEST; each
    element is visible to column exprs under ``alias``. Null/empty arrays
    produce no rows — the reference's ``UNNEST(...) WHERE col IS NOT
    NULL`` inner semantics; use ``explode_outer=True`` to keep one
    null-element row per source row instead.
    ``ensure``: DDL string of source columns this spec references that
    may be ABSENT on old shards — padded as typed NULLs before anything
    else resolves.
    ``where``: SQL predicate applied AFTER the explode (it may reference
    the element alias).
    """

    name: str
    columns: tuple[ColumnSpec, ...] = field(default_factory=tuple)
    explode: str | None = None
    alias: str = "x"
    explode_outer: bool = False
    where: str | None = None


def derive_ensure_ddl(spec: EntitySpec) -> str | None:
    """Derive the schema-evolution padding DDL from a spec's own column
    exprs: bare top-level references pad as their try_cast target type,
    depth-2 struct references pad the root as a one-level STRUCT of the
    referenced fields. (Top-level-absent columns only — the reference's
    ensure_source_columns ALTERs flat columns the same way; a PARTIALLY
    shaped struct on an old shard is the caller's schema to declare via
    an explicit ``ensure`` DDL, as the works battery does.)"""
    scalars: dict[str, str] = {}
    structs: dict[str, dict[str, str]] = {}
    alias_fields: dict[str, str] = {}
    skip = {spec.alias} if spec.explode is not None else set()
    for c in spec.columns:
        e = c.expr.strip()
        if _BARE_REF.match(e):
            if e not in skip:
                scalars.setdefault(e, c.type)
        else:
            m = _DOTTED_REF.match(e)
            if m and m.group(1) not in skip:
                structs.setdefault(m.group(1), {})[m.group(2)] = c.type
            elif m:
                alias_fields.setdefault(m.group(2), c.type)
    parts = [f"{name} {typ}" for name, typ in scalars.items() if name not in structs]
    for root, fields in structs.items():
        inner = ", ".join(f"{f}: {t}" for f, t in fields.items())
        parts.append(f"{root} STRUCT<{inner}>")
    # The explode source itself may be absent on old shards; a bare column
    # reference pads as an array whose element shape is inferred from how
    # the element alias is used (dotted refs → STRUCT of those fields,
    # bare scalar use → STRING; try_cast re-types on projection). Exprs
    # more complex than a bare reference stay a declared-`ensure` concern.
    if (
        spec.explode is not None
        and _BARE_REF.match(spec.explode.strip())
        and spec.explode.strip() not in scalars
        and spec.explode.strip() not in structs
    ):
        if alias_fields:
            inner = ", ".join(f"{f}: {t}" for f, t in alias_fields.items())
            elem = f"STRUCT<{inner}>"
        else:
            elem = "STRING"
        parts.append(f"{spec.explode.strip()} ARRAY<{elem}>")
    return ", ".join(parts) or None


def extract_entity(source: DataFrame, spec: EntitySpec, ensure: str | None = None) -> DataFrame:
    """Apply one EntitySpec to the parsed source frame.

    ``ensure``: explicit schema-evolution DDL; when omitted, a best-effort
    DDL is derived from the spec's own column references
    (``derive_ensure_ddl``) so old shards missing referenced top-level
    columns extract typed NULLs instead of failing analysis."""
    from science_datalake_spark.sources.json_source import ensure_columns

    df = source
    if ensure is None:
        ensure = derive_ensure_ddl(spec)
    if ensure:
        df = ensure_columns(df, ensure)
    if spec.explode is not None:
        gen = F.explode_outer if spec.explode_outer else F.explode
        df = df.select("*", gen(F.expr(spec.explode)).alias(spec.alias))
    if spec.where:
        df = df.filter(F.expr(spec.where))
    cols = [
        F.expr(f"try_cast(({c.expr}) AS {c.type})").alias(c.out) for c in spec.columns
    ]
    return df.select(*cols)


def extract_battery(
    source: DataFrame,
    specs: dict[str, EntitySpec] | list[EntitySpec],
    ensure: str | None = None,
) -> dict[str, DataFrame]:
    """All specs over one source frame → {table name: DataFrame}.

    ``ensure`` is shared: the union of possibly-absent source columns for
    the whole battery (one DDL string, padded once per output plan)."""
    if isinstance(specs, dict):
        items = list(specs.values())
    else:
        items = list(specs)
    return {s.name: extract_entity(source, s, ensure=ensure) for s in items}


# --- a works-like battery, the reference's flagship config shape -----------

#: Main + 3 sub-tables over a works-like nested document (the
#: convert_openalex.py:435-577 shape: flat TRY_CAST main row, one
#: sub-table per UNNEST'd array of structs / strings).
WORKS_BATTERY: dict[str, EntitySpec] = {
    "works": EntitySpec(
        name="works",
        columns=(
            ColumnSpec("id", "id"),
            ColumnSpec("doi", "doi"),
            ColumnSpec("title", "title"),
            ColumnSpec("publication_year", "publication_year", "int"),
            ColumnSpec("cited_by_count", "cited_by_count", "bigint"),
            ColumnSpec("is_retracted", "is_retracted", "boolean"),
        ),
    ),
    "works_authorships": EntitySpec(
        name="works_authorships",
        explode="authorships",
        alias="a",
        columns=(
            ColumnSpec("work_id", "id"),
            ColumnSpec("author_id", "a.author.id"),
            ColumnSpec("author_display_name", "a.author.display_name"),
            ColumnSpec("is_corresponding", "a.is_corresponding", "boolean"),
        ),
    ),
    "works_topics": EntitySpec(
        name="works_topics",
        explode="topics",
        alias="tp",
        columns=(
            ColumnSpec("work_id", "id"),
            ColumnSpec("topic_id", "tp.id"),
            ColumnSpec("score", "tp.score", "double"),
        ),
    ),
    "works_referenced_works": EntitySpec(
        name="works_referenced_works",
        explode="referenced_works",
        alias="rw",
        columns=(
            ColumnSpec("work_id", "id"),
            ColumnSpec("referenced_work_id", "rw"),
        ),
    ),
}

#: Source columns the works battery references that old snapshot shards
#: may lack (the schema-evolution set convert_openalex.py guards).
WORKS_ENSURE = (
    "id STRING, doi STRING, title STRING, publication_year STRING, "
    "cited_by_count STRING, is_retracted STRING, "
    "authorships ARRAY<STRUCT<author: STRUCT<id: STRING, display_name: STRING>, "
    "is_corresponding: BOOLEAN>>, "
    "topics ARRAY<STRUCT<id: STRING, score: DOUBLE>>, "
    "referenced_works ARRAY<STRING>"
)
