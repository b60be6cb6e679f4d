"""Durable MinHash-LSH band index: dedup NEW batches against HISTORY
without reprocessing history.

The batch operators in ``dedup.py`` find near-duplicates WITHIN one
corpus snapshot. Real ingestion is incremental — each crawl / dump /
shard arrives against terabytes already accepted — and re-running the
full self-join over history per batch is O(corpus) work for O(batch)
data. This module persists the LSH banding of accepted documents as a
compact Parquet relation ``(band, mh, id)`` (``num_hashes`` rows per
document — KILOBYTES per document of text) and answers "is anything in
this batch a near-dup of anything ever accepted?" by joining the NEW
batch's bands against that relation:

- history text is never re-read, re-shingled, or re-hashed; only the
  band relation is probed;
- the join is an equi join on (band, mh) — shuffle-hash-able,
  AQE-skew-splittable, and the new side is batch-sized, so the shuffle
  cost is O(index + batch), not O(corpus^2);
- the index is Hive-partitioned by ``band``, so a probe restricted to
  selected bands (recall/cost tuning) prunes directories;
- accepting a batch appends only the survivors' band rows (new Parquet
  files into existing partitions — no rewrite of history).

Same recall contract as ``dedup.lsh_candidate_pairs``: documents
sharing ANY band min-hash become candidates; verification (e.g.
``ngram_jaccard_pairs``) stays the caller's second stage.

Reference parity note: the reference has no incremental dedup surface
(its convert_* scripts reprocess full dumps); this is additive for the
100 TB continuous-ingestion story, mirroring `similarity.py`'s durable
IVF lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from science_datalake_spark.operators.dedup import minhash_signatures


def _bands(signatures: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    stack_args = ", ".join(f"'{b}', mh{b}" for b in range(num_hashes))
    return signatures.select(
        F.col(id_col).alias("id"),
        F.expr(f"stack({num_hashes}, {stack_args}) AS (band, mh)"),
    ).select("band", "mh", "id")


def lsh_index_write(
    signatures: DataFrame,
    id_col: str,
    path: str,
    num_hashes: int = 8,
    mode: str = "overwrite",
) -> None:
    """Materialize (or append to) the band index at ``path``. Rows are
    ``(band, mh, id)``, Hive-partitioned by ``band``; within each
    partition, files are sorted by ``mh`` so Parquet row-group min/max
    stats support mh-range skipping on probe."""
    (
        _bands(signatures, id_col, num_hashes)
        .repartition("band")
        .sortWithinPartitions("mh")
        .write.partitionBy("band")
        .mode(mode)
        .parquet(path)
    )


def dedup_candidates_against_index(
    spark: SparkSession,
    signatures: DataFrame,
    id_col: str,
    path: str,
    num_hashes: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs between the NEW batch (its signature
    frame) and the INDEXED history: distinct ``(id_new, id_old)``.
    Batch-internal pairs are NOT included — run
    ``dedup.lsh_candidate_pairs`` on the same signature frame for those
    (one extra self-join over batch-sized input).

    ``max_bucket`` drops degenerate band buckets by their size in the
    INDEX (boilerplate fingerprints accumulate in history; a fresh
    batch's counts say little) — same stop-fingerprint discipline as
    the batch operator."""
    idx = spark.read.parquet(path)
    if max_bucket is not None:
        sizes = idx.groupBy("band", "mh").agg(F.count("*").alias("__n"))
        idx = idx.join(
            sizes.filter(F.col("__n") <= max_bucket).select("band", "mh"),
            ["band", "mh"],
        )
    new_bands = _bands(signatures, id_col, num_hashes)
    return (
        new_bands.alias("n")
        .join(
            idx.alias("h"),
            (F.col("n.band") == F.col("h.band")) & (F.col("n.mh") == F.col("h.mh")),
        )
        .select(F.col("n.id").alias("id_new"), F.col("h.id").alias("id_old"))
        # self-pair guard: ids are globally unique across batches, so
        # id_new == id_old can only mean THIS batch's bands already
        # reached the index (an at-least-once replay after a partial
        # failure). Treating a replayed doc as a dup of itself would
        # silently drop it forever — filter the pair instead, so a
        # replay converges to the same accepted set.
        .filter(F.col("id_new") != F.col("id_old"))
        .distinct()
    )


def incremental_dedup_minhash(
    spark: SparkSession,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    n: int = 3,
    num_hashes: int = 8,
    hash_fn: str = "xxhash64",
    max_bucket: int | None = None,
    accept=None,
) -> tuple[DataFrame, DataFrame]:
    """One ingestion step: returns ``(accepted, dup_pairs)`` and appends
    the ACCEPTED documents' bands to the index.

    - ``dup_pairs``: (id_dropped, id_kept) — vs history the NEW doc
      drops and the indexed doc is kept; batch-internal candidates
      keep the LOWER id (first-seen-wins, matching exact_dedup's
      keep-lowest discipline). A doc dropped via an internal pair
      whose keeper was itself dropped against history is still
      (transitively) a near-dup of history — the pair rows carry the
      full chain for audits.
    - history NEVER changes: only accepted docs append band rows, so a
      rejected near-dup cannot later vouch for its own twin.
    - ``accept``: optional callable invoked with the accepted frame
      BEFORE the index append. Durable consumers (the streaming sink)
      must persist accepted rows through this hook, not after return:
      append-then-crash with accepted rows unwritten is the one
      ordering an at-least-once replay cannot repair (the replay
      would see the batch's own bands as history). With the hook the
      crash orderings all converge — see streaming/dedup.py.

    The batch is assumed to fit the normal batch-job profile (its
    signature frame is persisted for the multi-join step and released
    before return). Ids must be globally unique across batches — the
    caller's ingest contract (the self-pair guard in
    ``dedup_candidates_against_index`` then makes replays safe)."""
    from science_datalake_spark.util import fs_exists

    sigs = minhash_signatures(
        batch, id_col, text_col, n=n, num_hashes=num_hashes, hash_fn=hash_fn
    ).persist()
    try:
        from science_datalake_spark.operators.dedup import lsh_candidate_pairs

        if fs_exists(spark, index_path):
            vs_hist = dedup_candidates_against_index(
                spark, sigs, id_col, index_path, num_hashes, max_bucket=max_bucket
            )
        else:
            # first batch bootstraps the index: no history, no hits
            id_type = sigs.schema[id_col].dataType
            vs_hist = spark.createDataFrame(
                [], schema=f"id_new {id_type.simpleString()}, id_old {id_type.simpleString()}"
            )
        vs_hist = vs_hist.select(
            F.col("id_new").alias("id_dropped"), F.col("id_old").alias("id_kept")
        )
        internal = lsh_candidate_pairs(
            sigs, id_col, num_hashes=num_hashes, max_bucket=max_bucket
        ).select(
            # keep the LOWER id within the batch: id_b drops
            F.col("id_b").alias("id_dropped"),
            F.col("id_a").alias("id_kept"),
        )
        # materialize the pairs ONCE, before anything derives from
        # them: the index append, the accept hook, and the caller's
        # reads all reuse this cache instead of re-running the
        # history-probe join per consumer (it is the dominant
        # per-batch cost on a large index)
        dup_pairs = vs_hist.unionByName(internal).persist()
        dup_pairs.count()

        rejected = dup_pairs.select(F.col("id_dropped").alias("__rid")).distinct()
        accepted = batch.join(
            rejected, batch[id_col] == F.col("__rid"), "left_anti"
        )
        if accept is not None:
            accept(accepted)
        accepted_sigs = sigs.join(
            rejected, sigs[id_col] == F.col("__rid"), "left_anti"
        )
        lsh_index_write(
            accepted_sigs, id_col, index_path, num_hashes, mode="append"
        )
    finally:
        sigs.unpersist()
    return accepted, dup_pairs
