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


def incremental_neardup_sink(
    index_path: str,
    accepted_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs_path: str | None = None,
    **minhash_kwargs,
):
    """foreachBatch sink closing the streaming↔batch ingestion loop for
    NEAR-duplicate dedup: every micro-batch runs the durable-index
    incremental dedup (operators/dedup_index.incremental_dedup_minhash)
    — probe vs ALL history, batch-internal LSH, survivors appended to
    both the accepted table and the band index. Contrast with
    ``dedup_stream``: that one is EXACT dedup with watermark-bounded
    in-memory state; this one is near-dup with DURABLE state, so the
    horizon is unbounded (a doc near-duplicating something accepted
    months ago is still caught) and a restart resumes from the on-disk
    index, not from empty state.

    Usage::

        stream.writeStream.foreachBatch(
            incremental_neardup_sink("/lake/lsh_index", "/lake/docs")
        ).start()

    ``pairs_path``: optionally record the (id_dropped, id_kept) audit
    rows. Ids must be globally unique across the stream (ingest
    contract, same as the batch operator).

    At-least-once safety: foreachBatch replays a micro-batch after any
    failure, so every write here is idempotent per ``batch_id``:

    - accepted rows (and pairs) land in a Hive partition
      ``ingest_batch=<batch_id>`` written with OVERWRITE — a replay
      rewrites the same directory instead of appending duplicates;
    - accepted rows are written BEFORE the index append (via the batch
      operator's ``accept`` hook) — combined with the index probe's
      self-pair guard, a crash at any point replays to the same
      accepted set (the only residue of a mid-batch crash is duplicate
      band rows in the index, which the probe's DISTINCT absorbs);
    - a marker under ``<accepted_path>/_batches/<batch_id>`` commits
      the batch: fully processed replays exit early, so even the
      index-bloat residue only occurs on genuine mid-batch failures.
      (Underscore-prefixed paths are invisible to Spark readers.)"""
    from science_datalake_spark.operators.dedup_index import (
        incremental_dedup_minhash,
    )
    from science_datalake_spark.util import fs_exists, fs_mkdirs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker = f"{accepted_path}/_batches/{batch_id}"
        if fs_exists(spark, marker):
            return  # replay of a fully committed batch

        def accept(accepted: DataFrame) -> None:
            accepted.write.mode("overwrite").parquet(
                f"{accepted_path}/ingest_batch={batch_id}"
            )

        _, pairs = incremental_dedup_minhash(
            spark,
            batch_df,
            id_col,
            text_col,
            index_path,
            accept=accept,
            **minhash_kwargs,
        )
        if pairs_path is not None:
            pairs.write.mode("overwrite").parquet(
                f"{pairs_path}/ingest_batch={batch_id}"
            )
        pairs.unpersist()
        fs_mkdirs(spark, marker)

    return sink
