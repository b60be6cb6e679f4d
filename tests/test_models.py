"""Pluggable batch-model contract: lazy per-worker init, drop-in custom
models, built-in stand-ins agree with their native-column twins."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from science_datalake_spark.models import (
    BatchModel,
    HashedEncoderModel,
    StopwordLangIDModel,
    apply_model,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog and it is a good day",
    "zx9 qq7 bb1 kk3",
    "",
    None,
    "a tale of two cities and the best of times",
]


def _docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id INT, text STRING")


def test_custom_model_plugs_in(spark):
    """Any object with predict_batch works — no engine changes needed."""

    class ShoutModel:
        def predict_batch(self, batch: pd.Series) -> pd.Series:
            return batch.map(lambda t: t.upper() if t else "")

    assert isinstance(ShoutModel(), BatchModel)
    out = apply_model(_docs(spark), ShoutModel, "string", "text", "shout")
    rows = {r["id"]: r["shout"] for r in out.collect()}
    assert rows[0].startswith("THE QUICK")
    assert rows[2] == "" and rows[3] == ""


def test_factory_called_lazily_not_on_driver(spark):
    """The predict_batch_udf contract: building the column must NOT build
    the model; only executing a batch does."""
    calls = []

    class Tracking:
        def __init__(self):
            calls.append("built")

        def predict_batch(self, batch: pd.Series) -> pd.Series:
            return batch.map(lambda t: "x")

    df = apply_model(_docs(spark), Tracking, "string", "text", "o")
    assert calls == []  # plan construction builds nothing
    assert df.count() == 5
    # (the factory then ran inside executor workers, not in this process)
    assert calls == []


def test_langid_model_matches_native_column(spark):
    from science_datalake_spark.operators.textops import predict_lang

    df = apply_model(_docs(spark), StopwordLangIDModel, "string", "text", "model_lang")
    both = df.withColumn("native_lang", predict_lang(F.col("text"))).collect()
    for r in both:
        assert r["model_lang"] == r["native_lang"], r


def test_encoder_model_matches_embed_udf(spark):
    from science_datalake_spark.operators.embedding import embed

    via_model = apply_model(
        _docs(spark), HashedEncoderModel, HashedEncoderModel.output_type, "text", "embedding"
    )
    via_udf = embed(_docs(spark), "text")
    m = {r["id"]: r["embedding"] for r in via_model.collect()}
    u = {r["id"]: r["embedding"] for r in via_udf.collect()}
    assert m == u
