"""Streaming decontamination: flag eval-set n-gram overlap on documents
AS THEY ARRIVE, before they ever land in a training shard.

The batch operator (operators/corpus.decontaminate, reference-class
eval-leakage gate) is an explode + broadcast join + per-doc groupBy —
correct for batch, but the groupBy is a stateful aggregation on a
stream. The streaming form keeps the SAME hashed-shingle semantics with
zero state: the eval set's distinct xxhash64 shingles are collected
ONCE at stream definition (a bounded batch action — the eval set is
small by the same contract the batch path's broadcast join already
assumes) and shipped as a Spark broadcast; each micro-batch row's
shingle array (JVM-hashed by ``with_hashed_word_ngrams``, identical
longs to the batch side) is probed against it in an Arrow-batched
vectorized UDF via searchsorted. Map-only, stateless — composes before
any stateful stage, and stream==batch equality is pinned by test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from science_datalake_spark.operators.dedup import with_hashed_word_ngrams


def eval_shingle_broadcast(
    eval_docs: DataFrame, text_col: str = "text", n: int = 3, cap: int = 5_000_000
):
    """Collect the eval set's distinct hashed shingles into a sorted numpy
    array wrapped in a Spark broadcast. Capped: an eval set is a bounded
    benchmark suite by contract; exceeding ``cap`` distinct shingles
    raises rather than silently materializing an unbounded driver array."""
    import numpy as np

    rows = (
        with_hashed_word_ngrams(eval_docs.select(text_col), text_col, n)
        .select(F.explode("ng").alias("__ng"))
        .distinct()
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        raise ValueError(
            f"eval set exceeds {cap} distinct shingles; decontamination "
            "streaming requires a bounded eval set (raise cap deliberately "
            "or pre-reduce the eval suite)"
        )
    arr = np.sort(np.array([r["__ng"] for r in rows], dtype=np.int64))
    spark = eval_docs.sparkSession
    return spark.sparkContext.broadcast(arr)


def decontaminate_stream(
    stream: DataFrame,
    eval_broadcast,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    max_overlap: float = 0.5,
) -> DataFrame:
    """Annotate a document stream with (n_shingles, n_shared, overlap,
    is_contaminated) — values identical to the batch operator (same
    xxhash64 shingle longs, same rounding), computed map-only per
    micro-batch. ``eval_broadcast`` comes from
    :func:`eval_shingle_broadcast` (build once, reuse across restarts —
    rebuilding it is one bounded batch job)."""
    import numpy as np

    shingled = with_hashed_word_ngrams(
        stream.withColumn("__txt", F.col(text_col)), "__txt", n, out="__ng"
    ).drop("__txt")

    @F.pandas_udf("struct<n_shingles: long, n_shared: long>")
    def _probe(ngs: pd.Series) -> pd.DataFrame:
        ev = eval_broadcast.value
        n_sh, n_hit = [], []
        for arr in ngs:
            if arr is None or len(arr) == 0:
                n_sh.append(0)
                n_hit.append(0)
                continue
            d = np.unique(np.asarray(arr, dtype=np.int64))
            n_sh.append(int(d.size))
            if ev.size:
                idx = np.searchsorted(ev, d)
                idx[idx >= ev.size] = ev.size - 1
                n_hit.append(int((ev[idx] == d).sum()))
            else:
                n_hit.append(0)
        return pd.DataFrame({"n_shingles": n_sh, "n_shared": n_hit})

    probed = shingled.withColumn("__m", _probe(F.col("__ng"))).drop("__ng")
    return (
        probed.withColumn("n_shingles", F.col("__m.n_shingles"))
        .withColumn("n_shared", F.col("__m.n_shared"))
        .drop("__m")
        .withColumn(
            "overlap",
            F.when(F.col("n_shingles") > 0,
                   F.round(F.col("n_shared") / F.col("n_shingles"), 4))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("is_contaminated", F.col("overlap") > max_overlap)
    )
