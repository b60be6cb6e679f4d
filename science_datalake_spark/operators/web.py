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


#: Trimmed public-suffix list (publicsuffix.org, public domain data):
#: the high-traffic TWO-LABEL public suffixes — a host ending in one of
#: these needs THREE labels for its registrable domain (site.co.uk, not
#: co.uk). The full PSL also carries rare 3-label and wildcard rules;
#: extend this set (it is a plain frozenset parameter) to widen coverage
#: — the expression shape is unchanged at any size (constant-folded
#: InSet, one hash probe per row).
PSL_TWO_LABEL_SUFFIXES: frozenset[str] = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
        "plc.uk", "sch.uk", "nhs.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
        "co.nz", "org.nz", "net.nz", "ac.nz", "govt.nz", "school.nz",
        "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
        "gr.jp", "lg.jp",
        "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
        "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
        "co.in", "net.in", "org.in", "ac.in", "gov.in", "edu.in", "res.in",
        "co.kr", "or.kr", "ne.kr", "ac.kr", "go.kr", "re.kr", "pe.kr",
        "com.tr", "org.tr", "net.tr", "edu.tr", "gov.tr", "av.tr",
        "com.ar", "org.ar", "net.ar", "edu.ar", "gob.ar",
        "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
        "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
        "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
        "co.za", "org.za", "net.za", "ac.za", "gov.za", "web.za",
        "com.my", "org.my", "net.my", "edu.my", "gov.my",
        "com.ph", "org.ph", "net.ph", "edu.ph", "gov.ph",
        "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn",
        "com.eg", "org.eg", "net.eg", "edu.eg", "gov.eg",
        "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa", "med.sa",
        "co.id", "or.id", "ac.id", "go.id", "sch.id", "web.id",
        "co.th", "or.th", "ac.th", "go.th", "in.th",
        "com.pk", "org.pk", "net.pk", "edu.pk", "gov.pk",
        "com.bd", "org.bd", "net.bd", "edu.bd", "gov.bd", "ac.bd",
        "com.ng", "org.ng", "net.ng", "edu.ng", "gov.ng",
        "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke", "sc.ke",
        "com.co", "org.co", "net.co", "edu.co", "gov.co",
        "com.pe", "org.pe", "net.pe", "edu.pe", "gob.pe",
        "com.ve", "org.ve", "net.ve", "edu.ve", "gob.ve",
        "com.ec", "org.ec", "net.ec", "edu.ec", "gob.ec",
        "com.uy", "org.uy", "net.uy", "edu.uy", "gub.uy",
        "com.do", "org.do", "net.do", "edu.do", "gob.do",
        "com.gt", "org.gt", "net.gt", "edu.gt", "gob.gt",
        "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
        "com.ua", "org.ua", "net.ua", "edu.ua", "gov.ua", "in.ua",
        "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl", "waw.pl",
        "co.at", "or.at", "ac.at", "gv.at",
        "com.ru", "org.ru", "net.ru", "msk.ru", "spb.ru",
    }
)


def registrable_domain(
    host: Column, public_suffixes: frozenset[str] = PSL_TWO_LABEL_SUFFIXES
) -> Column:
    """eTLD+1: the registrable domain of a host. ``a.b.site.com`` →
    ``site.com``; ``news.bbc.co.uk`` → ``bbc.co.uk`` because ``co.uk``
    is a PUBLIC suffix — grouping by the naive last-two-labels rule
    would collapse every .co.uk site into one "domain" and a domain cap
    would starve ccTLD-heavy crawls.

    The suffix set compiles to a constant-folded ``isin`` (Catalyst
    InSet: one hash probe per row, whole-stage codegen — cheaper and
    simpler than the broadcast-join formulation, with identical
    results for 2-label rules). Fallbacks: last two labels when the
    host's 2-label tail is not a public suffix; the host itself when it
    has no dot or IS itself a public suffix (no registrable domain —
    mirrors PSL semantics as closely as a non-wildcard subset can)."""
    host = F.lower(host)  # PSL probe is case-sensitive; url_host already
    # lowercases, but a caller-supplied host column must not silently
    # miss the set and fall back to the wrong two-label rule
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when((last3 != "") & last2.isin(*public_suffixes), last3)
        .when(last2 != "", last2)
        .otherwise(host)
    )


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
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain, chosen
    in ``order_cols`` order (deterministic — pass a quality score desc +
    unique id tiebreak). Adds ``domain`` and ``domain_kept`` (rank <=
    cap) rather than filtering, so callers can audit drop rates per
    domain before committing.

    Salted threshold cap — a single ``row_number() OVER (PARTITION BY
    domain)`` would place ALL rows of one domain in ONE task and fully
    sort them (row_number sorts the whole partition; there is no
    running-rank short-circuit), so a C4-scale mega-domain with hundreds
    of millions of pages becomes a single straggler-reducer. Instead the
    corpus is never windowed at all:

    1. survivor scan (tiny): rank within ``(domain, salt)`` where salt =
       xxhash64(order_cols) mod ``salt_buckets`` — the mega-domain
       spreads over ``salt_buckets`` tasks, and the ``rank <= cap``
       filter lets Spark insert a partial ``WindowGroupLimit`` BEFORE
       the exchange, so at most cap rows per (domain, salt) per map
       partition ever shuffle. Any row with salted-local rank > cap
       provably has global rank > cap, so the survivors contain every
       true top-cap row.
    2. per-domain threshold: the cap-th smallest survivor order-key
       (lexicographic struct over ``order_cols``) from <=
       salt_buckets*cap rows per domain — a one-row-per-domain table.
    3. the corpus side is a map-only broadcast join against that
       threshold table: ``kept = key <= threshold`` (or the domain has
       fewer than cap rows). No shuffle, no sort, no window touches the
       full corpus.

    Output is identical to the one-window form whenever ``order_cols``
    is a total order with non-NULL keys (equality-tested) — exactly the
    documented determinism contract; key ties beyond the tiebreak or
    NULL order values would make the one-window form itself
    nondeterministic. The threshold join is deliberately NOT
    hint-forced: Catalyst/AQE broadcasts it while the domain count fits
    the broadcast threshold (asserted for the common case in
    tests/test_plans.py) and degrades to a shuffled hash join at
    extreme domain cardinality — a forced ``F.broadcast`` would instead
    die at the 8 GB broadcast limit on a 100M-domain crawl (review
    finding). Still sort-free on the corpus either way."""
    from pyspark.sql import Window

    order = [F.col(c) for c in order_cols]
    key = F.struct(*order)
    base = df.withColumn("domain", registrable_domain(url_host(F.col(url_col))))
    if max_per_domain <= 0:
        # nothing can rank <= 0: flag everything dropped without building
        # the survivor scan (whose empty left join would yield NULL flags)
        return base.withColumn("domain_kept", F.lit(False))
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
    # struct comparison is lexicographic over its fields, so ordering by
    # the key struct IS the multi-column asc order of ``order_cols``
    w1 = Window.partitionBy("domain", "__salt").orderBy("__k")
    survivors = (
        base.select("domain", key.alias("__k"), salt.alias("__salt"))
        .withColumn("__lrank", F.row_number().over(w1))
        .filter(F.col("__lrank") <= F.lit(max_per_domain))
    )
    thr = survivors.groupBy("domain").agg(
        F.count(F.lit(1)).alias("__n_surv"),
        # cap-th smallest survivor key; NULL (via get past the end) when
        # the domain holds fewer than cap rows — then everything is kept
        F.get(F.sort_array(F.collect_list("__k")), max_per_domain - 1).alias(
            "__thr"
        ),
    ).withColumnRenamed("domain", "__thr_domain")
    out = base.join(
        thr, F.col("domain").eqNullSafe(F.col("__thr_domain")), "left"
    ).withColumn(
        "domain_kept",
        (F.col("__n_surv") < F.lit(max_per_domain)) | (key <= F.col("__thr")),
    )
    return out.drop("__thr_domain", "__n_surv", "__thr")
