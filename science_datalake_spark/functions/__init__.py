"""Scalar function library — the engine's reusable column expressions.

The most important is DOI normalization: the reference's universal join key
(README.md:117-138; methods.tex:125-150). All functions are pure Column
expressions (JVM-side, whole-stage-codegen friendly) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "clean_doi",
    "synth_doi",
    "is_valid_doi",
    "valid_title_abstract",
    "inverted_index_to_text",
]


def clean_doi(doi: Column) -> Column:
    """Normalize a DOI to the canonical lowercase, prefix-free form.

    Semantics of the reference's DOI_CLEAN_SQL (convert_fulltext.py:52-58):
    if the string contains ``doi.org/``, keep what follows; always
    lowercase. Handles the three wild formats: bare ``10.x/...``,
    ``https://doi.org/10.x/...``, and uppercase/protocol variants.
    """
    lowered = F.lower(doi)
    extracted = F.regexp_extract(lowered, r"doi\.org/(.+)$", 1)
    return F.lower(F.coalesce(F.nullif(extracted, F.lit("")), doi))


def is_valid_doi(doi: Column) -> Column:
    """The reference's junk filter applied before DOI-keyed windows/joins:
    ``doi IS NOT NULL AND doi != '' AND LENGTH(doi) >= 5``
    (materialize_unified_papers.py:116). Filtering BEFORE the dedup window
    kills the null-key skew bucket at scale (SURVEY §7.4)."""
    return doi.isNotNull() & (doi != "") & (F.length(doi) >= 5)


def synth_doi(key: Column, suffix: Column) -> Column:
    """Deterministically synthesize the three wild DOI formats from a
    numeric key — used to exercise clean_doi on DOI-less testdata.

    Output strings are identical to the original 4-branch CASE
    formulation, but built as ONE concat over literal-array lookups: the
    CASE duplicated the key expression ~9× per call, and clean_doi +
    predicate pushdown then re-inline the whole call ~4-6× more — on the
    unify_coverage plan that compounded into a tree Catalyst spent
    ~2.5 s analyzing/optimizing per run (driver CPU, zero cluster work;
    execution itself was 0.06 s). The flat form cut plan-build+optimize
    ~3× (measured; see BENCH_NOTES).

    Defined over NON-NEGATIVE keys (all callers synthesize from row
    counts / moduli): pmod keeps negative keys total (they cycle through
    the same four formats) instead of the plain ``%`` form, whose
    negative remainder made element_at throw INVALID_INDEX_OF_ZERO."""
    m = (F.pmod(key, F.lit(4)) + 1).cast("int")
    base = F.concat(F.lit("10."), (key + 1000).cast("string"))
    pre = F.element_at(F.lit(["", "https://doi.org/", "HTTPS://DOI.ORG/", "doi.org/"]), m)
    mid = F.element_at(F.lit(["/j.", "/x", "/Y", "/z"]), m)
    # the 4th format carries no suffix (fixed '/z' tail)
    suf = F.when(m == 4, F.lit("")).otherwise(suffix)
    return F.concat(pre, base, mid, suf)


def inverted_index_to_text(json_col: Column) -> Column:
    """Rebuild abstract text from OpenAlex's inverted index
    ``{"word": [pos, ...], ...}`` — the reference does this row-by-row in
    Python (convert_openalex.py:100-117); here it is a pure column
    expression: parse the JSON map, flatten to (pos, word) pairs, sort by
    position, join. Stays JVM-side (no UDF), so it vectorizes over the
    479M-work corpus.
    """
    parsed = F.from_json(json_col, "map<string, array<int>>")
    pairs = F.flatten(
        F.transform(
            F.map_entries(parsed),
            lambda kv: F.transform(
                kv["value"], lambda pos: F.struct(pos.alias("pos"), kv["key"].alias("word"))
            ),
        )
    )
    ordered = F.array_sort(pairs)  # struct sort: by pos, then word
    return F.array_join(F.transform(ordered, lambda s: s["word"]), " ")


def valid_title_abstract(
    title: Column, abstract: Column, language: Column, min_title: int = 10, min_abstract: int = 50
) -> Column:
    """The reference's document-validity flag (convert_openalex.py:139-147):
    english + title/abstract length floors + readability, as one native
    boolean expression (no UDF)."""
    readable = _is_readable_text(abstract)
    return (
        (language == "en")
        & title.isNotNull()
        & (F.length(title) >= min_title)
        & abstract.isNotNull()
        & (F.length(abstract) >= min_abstract)
        & readable
    )


def _is_readable_text(text: Column) -> Column:
    """≥80% printable-ASCII, ≥10 words, avg word length ≤25, ≥50% alpha —
    the reference's is_readable_text UDF (convert_openalex.py:120-136)
    re-expressed as native column math so it stays in codegen."""
    n = F.length(text)
    ascii_ratio = F.length(F.regexp_replace(text, r"[^\x20-\x7E]", "")) / n
    alpha_ratio = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / n
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    avg_word_len = n / F.greatest(n_words, F.lit(1))
    return (
        text.isNotNull()
        & (n > 0)
        & (ascii_ratio >= 0.8)
        & (n_words >= 10)
        & (avg_word_len <= 25)
        & (alpha_ratio >= 0.5)
    )
