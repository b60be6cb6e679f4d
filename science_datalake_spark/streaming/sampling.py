"""Streaming weighted reservoir: maintain an exactly-n weighted sample
WITHOUT replacement over an unbounded document stream, with a durable
parquet artifact as the only state.

Why this is possible with bounded state: the A-ES ranking key
(operators/sampling.weighted_sample — ln(u)/w with u a pure md5 function
of the row key) is ORDER-INDEPENDENT, so the top-n over "everything seen
so far" equals the top-n over (current sample ∪ new batch). Each
micro-batch therefore: read the ≤n-row artifact, union the batch, re-cut
with the BATCH operator, rewrite the artifact. Stream == batch holds
EXACTLY — same Spark expressions, same rows — not just in the limit; an
at-least-once replay is idempotent because a replayed row carries the
same deterministic key (duplicates are collapsed on the row key before
the cut).

This is the same durable-sink shape as streaming/dedup.incremental_bloom_sink:
the artifact is the state, bounded BY CONSTRUCTION (n rows), and any
batch job can consume or rebuild it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from science_datalake_spark.operators.sampling import weighted_sample
from science_datalake_spark.util import fs_exists


def weighted_sample_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    n: int,
    key_col: str,
    weight_col: str,
    seed: int = 42,
):
    """Configure a foreachBatch writer maintaining the n-row weighted
    sample at ``path``. Returns the un-started DataStreamWriter — the
    caller attaches a trigger and calls ``.start()`` (so availableNow /
    processingTime stay the caller's choice).

    Per batch: artifact(≤n) ∪ batch → dropDuplicates(key) → batch
    weighted_sample → collect (≤n rows — the bounded-artifact contract) →
    overwrite. The collect is what makes read-then-overwrite of the same
    path safe, and it is bounded by n regardless of stream volume.

    The only failure treated as "first batch" is the artifact not
    existing yet (probed via the Hadoop FS, the same check batch readers
    use). Any OTHER read failure — transient FS error, corrupt footer —
    propagates and fails the micro-batch, so the checkpoint retries
    instead of silently discarding the accumulated reservoir.
    """

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if fs_exists(spark, path):
            cur = spark.read.parquet(path).select(*batch_df.columns)
        else:
            cur = None
        pool = batch_df if cur is None else batch_df.unionByName(cur)
        pool = pool.dropDuplicates([key_col])
        sample = weighted_sample(pool, n, key_col, weight_col, seed)
        rows = sample.collect()
        if rows:
            spark.createDataFrame(rows, sample.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(path)

    return (
        stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
    )
