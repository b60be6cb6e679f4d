"""Web-corpus curation: URL normalization, domain extraction, per-domain
caps — the C4/RefinedWeb-style source-diversity controls applied before
text-level dedup in a web training pipeline (a handful of mega-domains
otherwise dominates the corpus).

All pure codegen regexp/string expressions in the Java∩RE2 syntax subset
(same discipline as the PII redactor, textops.py) so the DuckDB oracle
evaluates the identical patterns. No UDFs, no shuffle until the caller
aggregates; ``domain_cap`` adds exactly one hash-partition window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme prefix ("https://", "ftp://", ...) — letter then letters/digits/+.-
_SCHEME = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped: scheme and
    query/fragment removed, first path-free segment taken. NULL-safe
    (NULL url → NULL host); a scheme-less ``site.com/x`` parses like C4's
    lenient splitter."""
    rest = F.regexp_replace(url, _SCHEME, "")
    rest = F.regexp_replace(rest, "[#?].*$", "")
    host = F.lower(F.regexp_extract(rest, "^([^/]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def registrable_domain(host: Column) -> Column:
    """eTLD+1 approximation: the last two dot-labels (``a.b.site.com`` →
    ``site.com``). A production pipeline swaps in the public-suffix list
    (a ~10k-row broadcast join keyed on ever-longer suffixes); the
    two-label rule is the deterministic, dependency-free stand-in and the
    plan downstream is identical either way."""
    return F.when(
        host.rlike(r"[^.]+\.[^.]+$"), F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    ).otherwise(host)


def normalize_url(url: Column) -> Column:
    """Canonical dedup key for URL-level exact dedup: lowercased
    www-stripped host + path with query/fragment and any trailing ``/``
    removed. Two spellings of the same page (scheme case, www, tracking
    params, trailing slash) collapse to one key. The host half IS
    ``url_host`` (shared expression, not a re-implementation — the
    dedup key and ``domain_cap``'s domains must agree on what a host
    is)."""
    rest = F.regexp_replace(url, _SCHEME, "")
    rest = F.regexp_replace(rest, "[#?].*$", "")
    path = F.regexp_replace(F.regexp_replace(rest, "^[^/]+", ""), "/+$", "")
    return F.concat(url_host(url), path)


def domain_cap(
    df: DataFrame,
    url_col: str,
    max_per_domain: int,
    order_cols: Sequence[str],
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain, chosen
    in ``order_cols`` order (deterministic — pass a quality score desc +
    unique id tiebreak). Adds ``domain`` and ``domain_kept`` (rank <=
    cap) rather than filtering, so callers can audit drop rates per
    domain before committing. One window shuffle keyed on the domain;
    the usual hot-domain skew is EXACTLY what the cap bounds — every
    partition's work is min(domain size, cap-ish) after the running-rank
    short-circuits."""
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("domain", registrable_domain(url_host(F.col(url_col))))
        .withColumn("__rank", F.row_number().over(w))
        .withColumn("domain_kept", F.col("__rank") <= F.lit(max_per_domain))
        .drop("__rank")
    )
