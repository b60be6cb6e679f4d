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


def incremental_bloom_sink(
    bloom_path: str,
    accepted_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    expected_items: int = 1_000_000,
    target_fpp: float = 0.01,
):
    """foreachBatch sink for EXACT cross-release incremental dedup behind
    the durable Bloom membership tier (operators/bloom): every
    micro-batch is fingerprinted, batch-internally deduped (first id per
    fingerprint), probed against the persisted bitmap — definitely-new
    rows skip the verify join entirely — and only might-contain
    candidates anti-join the accepted table's fingerprints, so results
    are EXACT at any false-positive rate. Survivors land in a Hive
    partition of the accepted table and their bits are OR-merged into
    the bloom artifact (the word arrays are both <= num_bits/64 longs —
    a driver-side numpy OR, never a corpus rescan). Contrast with
    ``incremental_neardup_sink``: that one is NEAR-dup with a durable
    LSH band index; this one is exact-content dedup whose durable state
    is a fixed-size bitmap regardless of corpus size.

    Geometry: the first batch sizes the filter via
    ``bloom_size_for(expected_items, target_fpp)``; every later batch
    reuses the artifact's geometry (probe and build must agree).

    At-least-once safety (the incremental_neardup_sink discipline):
    accepted rows land in ``ingest_batch=<batch_id>`` with OVERWRITE;
    the verify join reads the accepted table EXCLUDING the current
    batch's own partition, so a replay after a mid-batch crash
    re-derives the same accepted set instead of anti-joining against
    its own half-written output; the bloom artifact is rewritten after
    the accepted write (a stale bitmap only costs extra verify-join
    candidates, never correctness); a marker under
    ``<accepted_path>/_batches/<batch_id>`` makes fully-committed
    replays exit early."""
    import numpy as np

    from pyspark.sql import Window

    from science_datalake_spark.operators.bloom import (
        BloomModel,
        bloom_build,
        bloom_might_contain,
        bloom_read,
        bloom_size_for,
        bloom_write,
    )
    from science_datalake_spark.util import fs_exists, fs_mkdirs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker = f"{accepted_path}/_batches/{batch_id}"
        if fs_exists(spark, marker):
            return  # replay of a fully committed batch
        w = Window.partitionBy("__fp").orderBy(id_col)
        batch = (
            with_fingerprint(batch_df, text_col)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        model = bloom_read(spark, bloom_path) if fs_exists(spark, bloom_path) else None
        have_prior = fs_exists(spark, accepted_path) and fs_exists(
            spark, f"{accepted_path}/_batches"
        )
        if model is not None and have_prior:
            from pyspark import StorageLevel

            tagged = bloom_might_contain(batch, "__fp", model).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            clear = tagged.filter(~F.col("might_contain")).drop("might_contain")
            cand = tagged.filter(F.col("might_contain")).drop("might_contain")
            prior_fps = (
                spark.read.parquet(accepted_path)
                .filter(F.col("ingest_batch") != batch_id)
                .select(F.col("fp").alias("__prior_fp"))
            )
            verified = cand.join(
                prior_fps, cand["__fp"] == F.col("__prior_fp"), "left_anti"
            )
            new = clear.unionByName(verified)
        else:
            tagged = None
            new = batch
        new = new.withColumnRenamed("__fp", "fp")
        new.write.mode("overwrite").parquet(
            f"{accepted_path}/ingest_batch={batch_id}"
        )
        if tagged is not None:
            tagged.unpersist()
        nb, nh = (
            (model.num_bits, model.num_hashes)
            if model is not None
            else bloom_size_for(expected_items, target_fpp)
        )
        add = bloom_build(
            spark.read.parquet(f"{accepted_path}/ingest_batch={batch_id}").select(
                "fp"
            ),
            "fp",
            nb,
            nh,
        )
        if model is not None:
            words = (
                np.array(model.words, dtype=np.int64)
                | np.array(add.words, dtype=np.int64)
            ).tolist()
            merged = BloomModel(nb, nh, [int(x) for x in words], model.n_items + add.n_items)
        else:
            merged = add
        bloom_write(merged, spark, bloom_path)
        fs_mkdirs(spark, marker)

    return sink
