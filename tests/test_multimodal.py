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


def test_unknown_format_real_decode_raises(spark):
    """md5-junk payloads are neither PNM nor WAV → the real path names the
    plug-in point instead of silently fabricating features."""
    with pytest.raises(Exception) as exc:
        extract_features(sample_assets(spark, n=2), fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_real_ppm_decode_features(spark):
    """fake=False REALLY decodes PPM rasters: features carry channel
    statistics, deterministic across runs."""
    from science_datalake_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        sample_image_assets,
    )
    import numpy as np

    feats = extract_features(sample_image_assets(spark, n=6), fake=False).cache()
    assert feats.count() == 6
    rows = {r["asset_id"]: r["features"] for r in feats.collect()}
    assert all(len(v) == FEATURE_DIM for v in rows.values())
    # cross-check asset 0 against a driver-side decode of the same bytes
    from science_datalake_spark.operators.multimodal import image_features

    size = 16
    y, x = np.mgrid[0:size, 0:size]
    img = np.stack(
        [(x * 17) % 256, (y * 33) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)
    roundtrip = decode_image(encode_ppm(img))
    assert np.array_equal(roundtrip, img)  # encode→decode is lossless
    expected = image_features(img)
    got = rows[0]
    assert got == pytest.approx(expected, abs=1e-6)


def test_real_ppm_resize_changes_raster(spark):
    from science_datalake_spark.operators.multimodal import (
        decode_image,
        resize_images,
        sample_image_assets,
    )

    out = resize_images(sample_image_assets(spark, n=3, size=16), 8, 4, fake=False)
    row = out.orderBy("asset_id").first()
    img = decode_image(bytes(row["payload"]))
    assert img.shape == (4, 8, 3)  # actually resampled, not just metadata
    assert (row["meta"]["width"], row["meta"]["height"]) == (8, 4)


def test_decoder_edge_cases():
    """Degenerate payloads are rejected or zeroed, never NaN/crash."""
    import io
    import wave

    import numpy as np

    from science_datalake_spark.operators.multimodal import (
        FEATURE_DIM,
        audio_features,
        decode_image,
        decode_wav,
        encode_ppm,
    )

    # 0x0 PNM → rejected (None), not a NaN feature vector
    assert decode_image(b"P5 0 0 255\n") is None
    # CRLF after maxval (Windows writers) → raster not shifted
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    crlf = b"P6 2 2 255\r\n" + img.tobytes()
    assert np.array_equal(decode_image(crlf), img)
    # normal single-\n path still exact
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    # zero-frame WAV → all-zero features, no FFT crash
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"")
    samples, rate = decode_wav(buf.getvalue())
    assert audio_features(samples, rate) == [0.0] * FEATURE_DIM
    assert audio_features(np.array([0.5]), 0) == [0.0] * FEATURE_DIM


def test_real_wav_decode_features(spark):
    """Distinct sine frequencies must land energy in distinct spectrum
    bins — proof the audio path computes real signal features."""
    from science_datalake_spark.operators.multimodal import sample_wav_assets

    feats = extract_features(sample_wav_assets(spark, n=3), fake=False)
    rows = {r["asset_id"]: r["features"] for r in feats.collect()}
    assert all(len(v) == FEATURE_DIM for v in rows.values())
    for fid, f in rows.items():
        assert f[1] == pytest.approx(0.3535, abs=0.01), fid  # sine RMS ≈ 0.5/√2
    spectra = {fid: f[4:] for fid, f in rows.items()}
    # higher tone → energy center in a later bin
    centers = {
        fid: sum(i * e for i, e in enumerate(s)) / sum(s) for fid, s in spectra.items()
    }
    assert centers[0] < centers[1] < centers[2]


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


def test_split_pnm_stream_and_uniform_sampling():
    import numpy as np

    from science_datalake_spark.operators.multimodal import (
        _uniform_indices,
        encode_ppm,
        split_pnm_stream,
    )

    frames = [np.full((4, 4, 3), v, dtype=np.uint8) for v in (0, 100, 200)]
    stream = b"".join(encode_ppm(f) for f in frames)
    parts = split_pnm_stream(stream)
    assert parts is not None and len(parts) == 3
    assert split_pnm_stream(b"RIFFnotvideo") is None
    assert split_pnm_stream(stream[:-5]) is None  # truncated last frame
    assert _uniform_indices(10, 4) == [0, 2, 5, 7]
    assert _uniform_indices(3, 10) == [0, 1, 2]  # clamp to available


def test_sample_frames_real_pnm_stream(spark):
    """fake=False decodes the concatenated-PNM clip: uniformly-sampled
    frame indices, real per-frame features (brightness rises with idx),
    and payload bytes never reach the output schema."""
    from science_datalake_spark.operators.multimodal import (
        sample_frames,
        sample_video_assets,
    )

    clips = sample_video_assets(spark, n=2, frames=10, size=8)
    out = sample_frames(clips, n_frames=4, fake=False)
    rows = out.orderBy("asset_id", "frame_idx").collect()
    assert len(rows) == 8  # 2 assets x 4 sampled frames
    assert "payload" not in out.columns
    by_asset = {}
    for r in rows:
        assert r["n_frames"] == 10 and r["width"] == 8 and r["height"] == 8
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, rs in by_asset.items():
        assert [r["frame_idx"] for r in rs] == [0, 2, 5, 7]
        means = [r["features"][0] for r in rs]  # mean R channel
        assert means == sorted(means) and means[-1] > means[0]  # brightens


def test_sample_frames_fake_path_and_ffmpeg_plug_point(spark):
    import pytest as _pytest

    from science_datalake_spark.operators.multimodal import (
        sample_assets,
        sample_frames,
    )

    assets = sample_assets(spark, n=3)
    fake = sample_frames(assets, n_frames=3, fake=True)
    assert fake.count() == 9  # deterministic 3 rows per asset
    with _pytest.raises(Exception, match="ffmpeg"):
        sample_frames(assets.limit(1), n_frames=2, fake=False).collect()


# ---------------------------------------------------------------------------
# perceptual hashing (round 8)
# ---------------------------------------------------------------------------


def test_image_dhash_invariances():
    """dHash is bit-identical under uniform brightness shift and under an
    upscale that preserves gradient signs, and far from a different image."""
    import numpy as np

    from science_datalake_spark.operators.multimodal import (
        image_dhash,
        resize_nearest,
    )

    rng_grid = np.add.outer(np.arange(16) * 7, np.arange(16) * 13) % 200
    img = np.stack([rng_grid, rng_grid, rng_grid], axis=-1).astype(np.uint8)
    h = image_dhash(img)
    assert len(h) == 64 and set(h) <= {"0", "1"}
    # uniform brightness shift (no clipping): identical bits
    assert image_dhash((img + 40).astype(np.uint8)) == h
    # 4x nearest upscale replicates pixels: gradient signs at the sampled
    # grid are preserved
    big = resize_nearest(img, 64, 64)
    assert image_dhash(big) == h
    # a structurally different image lands far away
    other = np.stack([rng_grid.T, rng_grid.T, rng_grid.T], axis=-1).astype(np.uint8)
    dist = sum(a != b for a, b in zip(h, image_dhash(other)))
    assert dist > 10


def test_audio_envelope_hash_invariances():
    import numpy as np

    from science_datalake_spark.operators.multimodal import audio_envelope_hash

    t = np.arange(8000) / 8000.0
    # amplitude-modulated tone: distinct on/off envelope structure
    env = (np.sin(2 * np.pi * 3 * t) > 0).astype(np.float32)
    sig = (np.sin(2 * np.pi * 440 * t) * env).astype(np.float32)
    h = audio_envelope_hash(sig, 8000)
    assert len(h) == 64 and "1" in h and "0" in h
    # amplitude scaling: identical bits
    assert audio_envelope_hash(sig * 0.25, 8000) == h
    # different envelope: far away
    sig2 = (np.sin(2 * np.pi * 440 * t) * (1.0 - env)).astype(np.float32)
    dist = sum(a != b for a, b in zip(h, audio_envelope_hash(sig2, 8000)))
    assert dist > 10
    # degenerate clips hash to all-zeros instead of crashing
    assert audio_envelope_hash(np.array([], dtype=np.float32), 8000) == "0" * 64


def test_perceptual_hashes_real_and_near_dup_pairs(spark):
    """A perturbed copy of each PPM image pairs with its original at small
    Hamming distance; structurally different images don't pair."""
    import numpy as np

    from science_datalake_spark.operators.multimodal import (
        ASSET_SCHEMA,
        asset_near_dup_pairs,
        encode_ppm,
        perceptual_hashes,
    )

    rows = []
    for i in range(4):
        # seeded random rasters: distinct images are ~32 bits apart in
        # dHash space (smooth analytic gradients would all share the
        # monotone-row sign pattern and falsely pair)
        g = np.random.default_rng(i).integers(0, 200, size=(16, 16))
        img = np.stack([g, g, g], axis=-1).astype(np.uint8)
        rows.append((i, "image", bytearray(encode_ppm(img)), (None, 16, 16, None)))
        # near-copy: uniform brightness +25 (gradient-sign preserving,
        # no clipping at max 199+25)
        rows.append(
            (100 + i, "image", bytearray(encode_ppm((img + 25).astype(np.uint8))), (None, 16, 16, None))
        )
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    hashes = perceptual_hashes(assets, fake=False)
    pairs = asset_near_dup_pairs(hashes, bands=8, max_hamming=4).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(4):
        assert (i, 100 + i) in got, (i, got)
    # no pair between different base images
    for a, b in got:
        assert b - a == 100, (a, b)
    assert all(r["kind"] == "image" for r in pairs)


def test_asset_near_dup_pairs_scoped_by_kind(spark):
    """Identical signatures in different modalities must NOT pair (the
    scope_cols guard), while same-kind identical signatures do."""
    from science_datalake_spark.operators.multimodal import asset_near_dup_pairs

    hashes = spark.createDataFrame(
        [
            (1, "image", "0" * 64),
            (2, "audio", "0" * 64),
            (3, "image", "0" * 64),
        ],
        "asset_id LONG, kind STRING, simhash STRING",
    )
    got = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in asset_near_dup_pairs(hashes).collect()
    }
    assert got == {(1, 3, "image")}


def test_perceptual_hash_video_stream_and_plumbing(spark):
    """PNM-stream 'video' payloads hash via their middle frame; the fake
    path stays format-agnostic and deterministic."""
    from science_datalake_spark.operators.multimodal import (
        perceptual_hashes,
        sample_assets,
        sample_video_assets,
    )

    vids = sample_video_assets(spark, n=2)
    out = perceptual_hashes(vids, fake=False).collect()
    assert len(out) == 2
    assert all(len(r["simhash"]) == 64 for r in out)
    fake = perceptual_hashes(sample_assets(spark, n=6)).collect()
    again = perceptual_hashes(sample_assets(spark, n=6)).collect()
    assert sorted(map(tuple, fake)) == sorted(map(tuple, again))
