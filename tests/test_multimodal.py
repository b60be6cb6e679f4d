"""Multimodal plumbing tests: binary columns through mapInPandas."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from science_datalake_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_stub,
    sample_assets,
)


def test_feature_extraction_shapes(spark):
    assets = sample_assets(spark, n=24)
    feats = extract_features(assets).cache()
    assert feats.count() == 24
    row = feats.orderBy("asset_id").first()
    assert len(row["features"]) == FEATURE_DIM
    assert all(-1.0 <= v < 1.0 for v in row["features"])
    # deterministic: same payload → same features
    again = extract_features(sample_assets(spark, n=24))
    assert feats.exceptAll(again).count() == 0


def test_features_drop_payload(spark):
    feats = extract_features(sample_assets(spark, n=4))
    assert "payload" not in feats.columns  # bytes never reach a shuffle


def test_resize_updates_meta(spark):
    out = resize_stub(sample_assets(spark, n=6), 32, 32)
    metas = out.select("meta.width", "meta.height").distinct().collect()
    assert [(m["width"], m["height"]) for m in metas] == [(32, 32)]


def test_real_decode_is_marked_unimplemented(spark):
    with pytest.raises(Exception) as exc:
        extract_features(sample_assets(spark, n=2), fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_knn_over_extracted_features(spark):
    """End-to-end: binary assets → features → cosine top-k (the multimodal
    similarity-search path)."""
    from science_datalake_spark.operators.similarity import cosine_topk

    feats = extract_features(sample_assets(spark, n=30)).withColumnRenamed(
        "features", "vec"
    )
    queries = feats.filter(F.col("asset_id") < 3)
    top = cosine_topk(feats, queries, "asset_id", "vec", k=5)
    assert top.count() == 15
    assert top.groupBy("query_id").count().agg(F.min("count")).first()[0] == 5
