"""Pluggable batch-model interface: the seam where real ML models
(sentence encoders, language identifiers) plug into the engine without
touching query code.

The deployed reference uses sentence-transformers (BGE) for embeddings
(build_embedding_linkage.py:223-243); this container has no model
runtime, so the engine ships deterministic stand-ins (hashed
bag-of-words encoder, stopword-density lang-ID). Both run behind ONE
interface shaped like Spark ML's ``predict_batch_udf``:

- a zero-arg **factory** builds the model — called lazily INSIDE the
  executor the first time a batch arrives, never on the driver, so a
  GPU model loads once per Python worker and is never pickled
- the model maps a ``pd.Series`` batch → ``pd.Series`` batch (Arrow
  transfer, vectorized inside)
- ``apply_model`` wires (factory, output_type) into a pandas UDF column

Swapping the stand-in for BGE on a GPU cluster is a one-line factory
change; every downstream operator (similarity, dedup, linkage) consumes
the output column unchanged.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Protocol, runtime_checkable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, FloatType, StringType


@runtime_checkable
class BatchModel(Protocol):
    """Anything with a vectorized ``predict_batch``."""

    def predict_batch(self, batch: pd.Series) -> pd.Series: ...


def model_udf(factory: Callable[[], BatchModel], output_type: DataType | str):
    """Wrap a model factory as a pandas UDF with lazy per-worker init.

    The factory result is cached in the UDF's closure state: one model
    instance per Python worker process, built on first batch (the
    ``predict_batch_udf`` contract). The factory itself must be
    picklable; the model it builds need not be cheap to serialize."""
    state: dict[str, BatchModel] = {}

    @F.pandas_udf(output_type)
    def udf(batch: pd.Series) -> pd.Series:
        model = state.get("model")
        if model is None:
            model = state["model"] = factory()
        return model.predict_batch(batch)

    return udf


def apply_model(
    df: DataFrame,
    factory: Callable[[], BatchModel],
    output_type: DataType | str,
    input_col: str | Column,
    out_col: str,
) -> DataFrame:
    """Append ``out_col`` = model(input_col) as an Arrow-batched column."""
    col = F.col(input_col) if isinstance(input_col, str) else input_col
    return df.withColumn(out_col, model_udf(factory, output_type)(col))


# --- built-in stand-in models ----------------------------------------------


class HashedEncoderModel:
    """Deterministic hashed-bag-of-words encoder (operators/embedding.py
    math); the model a GPU deployment replaces with BGE/MiniLM."""

    output_type = ArrayType(FloatType())

    def predict_batch(self, batch: pd.Series) -> pd.Series:
        from science_datalake_spark.operators.embedding import _encode_batch

        return _encode_batch(batch)


class StopwordLangIDModel:
    """Stopword-density English detector (textops.predict_lang semantics);
    replace with fasttext/langdetect in deployment."""

    output_type = StringType()

    def __init__(self, threshold: float = 0.10):
        self.threshold = threshold

    def predict_batch(self, batch: pd.Series) -> pd.Series:
        from science_datalake_spark.operators.textops import EN_STOPWORDS

        sw = set(EN_STOPWORDS)

        def lang(text: str | None) -> str:
            toks = text.lower().split() if text else []
            if not toks:
                return "other"
            ratio = sum(t in sw for t in toks) / len(toks)
            return "en" if ratio >= self.threshold else "other"

        return batch.map(lang)
