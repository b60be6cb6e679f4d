"""Text → embedding encoding (the reference's sentence-transformer step,
build_embedding_linkage.py:223-243) with a deterministic stand-in encoder.

The real model (BGE-large / MiniLM) is not in this container; the
environment-independent replacement is feature hashing: each token's md5
selects ``dim`` bucket indices with ±1 signs, the document vector is the
L2-normalized bucket sum. This IS a real (if weak) embedding — documents
sharing tokens get high cosine — and it is deterministic, so ANN results
are testable without a model. The pandas-UDF shape (Arrow batches in,
ndarray math inside, list column out) is exactly what a real
``predict_batch_udf`` encoder uses; swap ``_encode_batch`` for the model
call on a GPU cluster.

Scale: encoding is embarrassingly parallel (map-only); the output column
feeds operators/similarity.py unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DIM = 64


def _token_bucket(token: str) -> tuple[int, int]:
    digest = hashlib.md5(token.encode()).digest()
    idx = int.from_bytes(digest[:4], "big") % DIM
    sign = 1 if digest[4] & 1 else -1
    return idx, sign


def _encode_batch(texts: pd.Series) -> pd.Series:
    out = []
    for text in texts:
        vec = np.zeros(DIM, dtype=np.float64)
        if text:
            for tok in text.lower().split():
                idx, sign = _token_bucket(tok)
                vec[idx] += sign
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec /= norm
        out.append(vec.astype(np.float32).tolist())
    return pd.Series(out)


@F.pandas_udf(ArrayType(FloatType()))
def embed_text_udf(texts: pd.Series) -> pd.Series:
    """Deterministic hashed-bag-of-words embedding (64-d, L2-normalized)."""
    return _encode_batch(texts)


def embed(df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
    return df.withColumn(out_col, embed_text_udf(F.col(text_col)))
