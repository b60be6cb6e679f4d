"""Streaming deduplication: exact-dedup a document stream as it arrives
(the LLM-pipeline ingestion shape — dedup BEFORE paying for downstream
processing, not after a batch lands).

Two built-ins over a file-source document stream:

- :func:`dedup_stream` — ``dropDuplicatesWithinWatermark`` on a content
  fingerprint: state stores one fingerprint per distinct document seen
  within the watermark horizon; late duplicates beyond the horizon are
  the documented trade-off (bounded state ↔ unbounded exactness). This
  is Spark's native streaming-dedup operator — state is watermark-
  evicted, so the job runs forever on bounded memory.
- :func:`dedup_counts_stream` — per-source running unique/duplicate
  counts (the monitoring twin: how dirty is the feed?).

The batch twin is operators/dedup.exact_dedup (same fingerprint
function), so stream==batch equivalence is testable with availableNow
drains like the other streaming modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from science_datalake_spark.operators.textops import fingerprint


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint column (md5 of normalized 200-char prefix —
    identical to the batch dedup key)."""
    return docs.withColumn("__fp", fingerprint(F.col(text_col)))


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct content fingerprint.

    State: one row per distinct fingerprint inside the watermark horizon,
    evicted as the watermark advances — the operator a 100 TB/day feed
    needs (unbounded dropDuplicates state would OOM eventually).
    """
    return (
        with_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def dedup_counts_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    source_col: str = "source",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-source total vs distinct-content counts (duplicate-rate
    monitoring): one watermarked aggregation, update-mode friendly."""
    return (
        with_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark)
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.approx_count_distinct("__fp").alias("n_distinct_approx"),
        )
    )
