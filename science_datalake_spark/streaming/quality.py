"""Streaming quality gate: apply the Gopher-style composite keep/drop
decision to documents AS THEY ARRIVE — the ingestion-time filter that
keeps garbage from ever landing in the lake (the batch twin is
operators/textops.quality_gate; the columns are the SAME expressions, so
stream==batch equivalence is exact by construction and pinned by test).

Two surfaces:

- :func:`quality_gate_stream` — stateless map: every micro-batch row
  gains the gate columns (n_tokens, dup_bigram_frac, stop_ratio,
  reject_reason, keep). No state, no watermark needed — it composes
  before any stateful stage (dedup, sessionization) at zero cost.
- :func:`reject_reason_counts_stream` — windowed per-reason counts (the
  monitoring twin: which rule is rejecting how much of the feed, hour by
  hour). Watermark-bounded windowed aggregation state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from science_datalake_spark.operators.textops import quality_gate_flags


def quality_gate_stream(
    docs: DataFrame,
    text_col: str = "text",
    **gate_kwargs,
) -> DataFrame:
    """Annotate a document stream with the quality-gate verdict columns.
    Stateless (map-only per micro-batch) — identical expressions to the
    batch gate, so a row's verdict never depends on arrival order."""
    # quality_gate_flags, not the Column form: the independent expression
    # trees re-ran the tokenizer per signal (round-9 funnel finding); the
    # flags transform materializes the split once and works unchanged on
    # a streaming relation (stateless projections)
    flagged = quality_gate_flags(docs, text_col=text_col, **gate_kwargs)
    return flagged.withColumns(
        {
            "reject_reason": F.col("quality_reject"),
            "keep": F.col("quality_reject").isNull(),
        }
    ).drop("quality_reject")


def reject_reason_counts_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "1 hour",
    **gate_kwargs,
) -> DataFrame:
    """Per-window, per-reject-reason document counts (kept rows count
    under reason 'kept'): the feed-health dashboard aggregation.
    Watermark-evicted windowed state — runs forever on bounded memory."""
    gated = quality_gate_stream(docs, text_col, **gate_kwargs)
    return (
        gated.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.coalesce(F.col("reject_reason"), F.lit("kept")).alias("reason"),
        )
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            "reason",
            "n_docs",
        )
    )
