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


# --- int8 quantization: the embedding-corpus storage/bandwidth lever --------


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    q_col: str = "q_vec",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× storage /
    bandwidth reduction for an embedding corpus (float32 → tinyint while
    ANN recall stays near-lossless at int8): ``scale = max|v| / 127``,
    ``q_i = round_half_away(v_i / scale)`` ∈ [-127, 127].

    Pure codegen — one array pass for the scale, one transform for the
    codes; NO UDF, so a relational twin evaluates the identical
    arithmetic (round-half-away is spelled ``sign(x)·floor(|x|/s + 0.5)``
    in both dialects; a bare ROUND would hit the dialects' half-even vs
    half-up disagreement). All-zero (or NULL-element-only) vectors get
    scale 0 and all-zero codes, never a division by zero. Max
    reconstruction error is scale/2 per element by construction.

    Scale: map-only at any corpus size; at 100 TB of float32 embeddings
    this is the difference between shuffling 100 TB and 25 TB through
    every downstream ANN index build.

    Implementation note: the scale is materialized as a COLUMN first and
    the code lambda references that column — inlining the array_max
    expression into the lambda re-evaluates it per ELEMENT (the HOF
    outer-expression trap, here O(d²) per vector: measured 6.6 s vs
    0.4 s over the 60k-vector sf1 table). Catalyst's CollapseProject
    keeps the multi-use alias as a projection boundary."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).cast("double")
    staged = df.withColumn(scale_col, F.coalesce(scale, F.lit(0.0)))
    s = F.col(scale_col)
    code = F.transform(
        v,
        lambda x: F.when(
            s > 0,
            F.signum(x) * F.floor(F.abs(x) / s + F.lit(0.5)),
        )
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return staged.withColumn(q_col, code)


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_int8`: ``v_i ≈ q_i · scale`` (float
    array, ready for the similarity tier unchanged). Map-only."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col), lambda x: (x.cast("double") * F.col(scale_col)).cast("float")
        ),
    )
