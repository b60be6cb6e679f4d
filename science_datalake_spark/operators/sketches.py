"""Mergeable sketches: HLL distinct-count and Count-Min frequency.

The 100 TB aggregation pattern these enable: compute a SKETCH per fine
partition (day, shard, source) in one scan, persist the binary column,
and answer coarser questions later by MERGING sketches — never
re-scanning the corpus. A 4 KB HLL answers "distinct users this
quarter" from 90 daily sketches in milliseconds; exact distinct would
re-shuffle the quarter.

Everything here stays JVM-side: Spark's Datasketches-backed
``hll_sketch_agg`` / ``hll_union_agg`` aggregates (partial-combinable —
the map side already merges) and the ``count_min_sketch`` aggregate.
Driver-side material is only the bounded artifacts (one CMS binary, a
candidate list capped by the support threshold).

Estimates are DETERMINISTIC for a given input (fixed hash functions) —
tests pin tolerance against exact counts, not golden estimates, so a
Spark-internal hash change cannot break them spuriously.

Additive beyond the reference (its engine answers these exactly,
in-process — fine at one node, quadratic pain at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch + its estimate: one hash-aggregate scan.
    ``lgk`` trades size for error (2^lgk registers; 12 → ~1.6% rsd,
    ~4 KB). Columns: keys…, ``sketch`` (binary, mergeable),
    ``approx_distinct`` (long)."""
    out = df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"))
    return out.withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))


def hll_rollup(
    df: DataFrame, keys: list[str], sketch_col: str = "sketch"
) -> DataFrame:
    """Re-aggregate persisted sketches to coarser keys WITHOUT touching
    the base data: union-merge is lossless (the union of HLL sketches
    is exactly the sketch of the union). ``keys`` may be empty for a
    global rollup."""
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    out = grouped.agg(F.hll_union_agg(sketch_col).alias("sketch"))
    return out.withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))


def cms_build(
    df: DataFrame,
    col: str,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 17,
) -> bytes:
    """Count-Min sketch of a column's value frequencies in one scan
    (partial-combinable aggregate). Returns the serialized sketch — a
    bounded driver artifact of width ceil(2/eps) × depth
    ceil(ln(1/(1-confidence))) counters. Estimates overcount by at most
    eps·N with the given confidence and NEVER undercount."""
    row = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(int(seed))
        ).alias("cms")
    ).first()
    return bytes(row["cms"])


def cms_estimate(spark: SparkSession, sketch: bytes, items: list) -> dict:
    """Frequency estimates for ``items`` from a serialized CMS
    (driver-side probes against the deserialized structure; items are
    probed with the same type Spark hashed — pass ints for a numeric
    column, strings for a string column)."""
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch)
    )
    return {it: cms.estimateCount(it) for it in items}


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: float,
    eps: float | None = None,
    confidence: float = 0.99,
    seed: int = 17,
) -> DataFrame:
    """Items occurring in at least ``support`` fraction of rows, with
    their EXACT counts — the skew-detection primitive (find the mega
    domains / stopword shingles / hot join keys before they melt a
    shuffle).

    Two single-scan passes, both with bounded state:
    1. candidates via ``freqItems`` (Misra-Gries: one pass, driver state
       O(1/support), guaranteed SUPERSET of the truly frequent items);
    2. exact counts for the candidate set only — a broadcast-filtered
       count aggregation over ≤ 2/support keys, so the groupBy state is
       bounded regardless of corpus cardinality.

    ``eps``/``confidence``/``seed`` are accepted for parity with
    ``cms_build`` (a CMS can replace pass 2 where a single pass matters
    more than exactness — see cms_build/cms_estimate).

    Returns (item, n, frac) sorted by n descending.
    """
    if not 0 < support < 1:
        raise ValueError("support must be in (0, 1)")
    total = df.count()
    if total == 0:
        return (
            df.select(F.col(col).alias("item"))
            .withColumn("n", F.lit(0).cast("long"))
            .withColumn("frac", F.lit(0.0))
            .limit(0)
        )
    cands = df.stat.freqItems([col], support).first()[0]
    out = (
        df.filter(F.col(col).isin(list(cands)))
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("frac", F.col("n") / F.lit(float(total)))
        .filter(F.col("n") >= float(support) * total)
    )
    return out.orderBy(F.desc("n"), "item")
