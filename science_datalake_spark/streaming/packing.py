"""Streaming sequence packing: the greedy first-fit packer
(operators/packing.pack_greedy) as a custom stateful streaming operator.

A training-data pipeline that ingests documents continuously wants them
packed into fixed-token-budget bins AS THEY ARRIVE — the per-shard
(current bin, current fill) pair is exactly the cross-micro-batch state
applyInPandasWithState exists for. Semantics: documents are packed in
arrival order (micro-batch order, then ``order_cols`` within a batch);
the open bin carries over between batches, so a document in batch N+1
tops up the bin batch N left unfilled — identical to running the batch
packer once over the concatenated arrival sequence (stream == batch-twin
tested, incl. the carried-over partially-filled bin).

Scale: state is two longs per shard; parallelism and state partitioning
both key on the shard, the same contract as the batch packer (the shard
count bounds the sequential chain). Bin ids are globally monotone per
shard across the stream's lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from science_datalake_spark.operators.packing import greedy_fill

#: (next bin id, fill of the open bin)
PACK_STATE = StructType(
    [StructField("bin", LongType()), StructField("fill", LongType())]
)


def _make_pack_fn(tokens_col: str, budget: int, order_cols: Sequence[str]):
    order = list(order_cols)

    def pack_group(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(order, kind="mergesort")
        b, fill = state.get if state.exists else (0, 0)
        # the SAME first-fit loop as the batch packer — the stream ==
        # batch-twin guarantee depends on sharing it, not copying it
        bins, b, fill = greedy_fill(rows[tokens_col], budget, b, fill)
        state.update((b, fill))
        rows = rows.reset_index(drop=True)
        rows["bin"] = bins
        yield rows

    return pack_group


def pack_stream(
    stream: DataFrame,
    tokens_col: str = "tok",
    budget: int = 256,
    shard_col: str = "shard",
    order_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Append-mode packed assignments: every arriving row is emitted
    exactly once, with all its input columns plus ``bin``; the open
    bin's fill persists in state per ``shard_col`` group. Column names
    are honored, mirroring the batch packer's signature (the output
    schema derives from the stream's own schema)."""
    out_schema = StructType(
        list(stream.schema.fields) + [StructField("bin", LongType())]
    )
    return stream.groupBy(shard_col).applyInPandasWithState(
        _make_pack_fn(tokens_col, budget, order_cols),
        outputStructType=out_schema,
        stateStructType=PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
