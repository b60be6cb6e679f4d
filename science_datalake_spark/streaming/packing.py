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

PACK_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("tok", LongType()),
        StructField("bin", LongType()),
    ]
)

#: (next bin id, fill of the open bin)
PACK_STATE = StructType(
    [StructField("bin", LongType()), StructField("fill", LongType())]
)


def _make_pack_fn(tokens_col: str, budget: int, order_cols: Sequence[str]):
    order = list(order_cols)

    def pack_group(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        shard = key[0]
        rows = pd.concat(list(pdfs)).sort_values(order, kind="mergesort")
        b, fill = state.get if state.exists else (0, 0)
        bins: list[int] = []
        for t in rows[tokens_col]:
            t = 0 if t is None or t != t else int(t)
            if fill > 0 and fill + t > budget:
                b, fill = b + 1, 0
            fill += t
            bins.append(b)
        state.update((b, fill))
        yield pd.DataFrame(
            {
                "shard": shard,
                "doc_id": rows["doc_id"].to_numpy(),
                "tok": rows[tokens_col].fillna(0).astype("int64").to_numpy(),
                "bin": bins,
            }
        )

    return pack_group


def pack_stream(
    stream: DataFrame,
    tokens_col: str = "tok",
    budget: int = 256,
    order_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Append-mode packed assignments for a (shard, doc_id, tok) stream.
    Every arriving document is emitted exactly once with its bin id; the
    open bin's fill persists in state."""
    return stream.groupBy("shard").applyInPandasWithState(
        _make_pack_fn(tokens_col, budget, order_cols),
        outputStructType=PACK_OUTPUT,
        stateStructType=PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
