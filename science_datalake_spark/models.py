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


_OPTIONAL_CACHE: dict[str, object] = {}


def optional_import(name: str):
    """``try: import`` upgrade probe — the reference's own pattern for
    langdetect (convert_fulltext.py:78-87: import, degrade to a heuristic
    when absent). Returns the module or None; never raises. The result is
    cached per process so hot paths (per-payload decode) don't re-pay the
    failed-import path scan."""
    import importlib

    if name in _OPTIONAL_CACHE:
        return _OPTIONAL_CACHE[name]
    try:
        mod = importlib.import_module(name)
    except Exception:
        mod = None
    _OPTIONAL_CACHE[name] = mod
    return mod


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


# --- optional-dependency upgrades ------------------------------------------


class LangDetectModel:
    """Real language ID via the ``langdetect`` package (the library the
    reference imports in convert_fulltext.py:78-87). Deterministic: the
    detector's PRNG is seeded once per worker."""

    output_type = StringType()

    def __init__(self):
        import langdetect

        langdetect.DetectorFactory.seed = 0
        self._detect = langdetect.detect
        self._exc = langdetect.lang_detect_exception.LangDetectException

    def predict_batch(self, batch: pd.Series) -> pd.Series:
        def lang(text: str | None) -> str:
            if not text or not text.strip():
                return "other"
            try:
                return self._detect(text)
            except self._exc:
                return "other"

        return batch.map(lang)


class SentenceTransformerEncoderModel:
    """Real sentence embeddings via ``sentence_transformers`` (the
    reference's BGE encode, build_embedding_linkage.py:223-243). Loaded
    once per Python worker by the model_udf factory contract."""

    output_type = ArrayType(FloatType())

    def __init__(self, model_name: str = "BAAI/bge-small-en-v1.5"):
        from sentence_transformers import SentenceTransformer

        self._model = SentenceTransformer(model_name)

    def predict_batch(self, batch: pd.Series) -> pd.Series:
        vecs = self._model.encode(
            ["" if t is None else str(t) for t in batch],
            normalize_embeddings=True,
            show_progress_bar=False,
        )
        return pd.Series([v.astype("float32").tolist() for v in vecs])


def auto_langid_factory(threshold: float = 0.10) -> Callable[[], BatchModel]:
    """Factory that upgrades to ``langdetect`` when importable, else the
    stopword stand-in. The probe runs INSIDE the factory — i.e. on each
    executor's Python worker, where the library actually has to exist —
    not at driver import time."""

    def factory() -> BatchModel:
        if optional_import("langdetect") is not None:
            return LangDetectModel()
        return StopwordLangIDModel(threshold)

    return factory


def auto_encoder_factory(
    model_name: str = "BAAI/bge-small-en-v1.5",
) -> Callable[[], BatchModel]:
    """Factory that upgrades to a sentence-transformers encoder when
    importable, else the deterministic hashed encoder. NOTE: the two
    models emit different dimensionalities (the ST model's vs the
    stand-in's 64) — downstream similarity operators are dim-agnostic,
    but persisted embeddings must not mix encoders."""

    def factory() -> BatchModel:
        if optional_import("sentence_transformers") is not None:
            return SentenceTransformerEncoderModel(model_name)
        return HashedEncoderModel()

    return factory
