"""Multimodal columns: opaque binary payloads + typed metadata, processed
by Arrow-batched mapInPandas (BASELINE.json north star).

Design: image/audio/video bytes live in a BINARY column next to a typed
metadata struct; decode / feature-extract / resize run as mapInPandas so
each Arrow batch is processed vectorized in Python.

Decode is REAL for the uncompressed formats this container can handle
without native libraries — PPM/PGM images (numpy header+raster parse)
and RIFF/WAV audio (stdlib ``wave`` + numpy) — including an actual
nearest-neighbor resize that re-encodes valid PNM bytes. Compressed
formats (JPEG/PNG/MP3/video) need PIL/ffmpeg, which are not in this
container: payloads that sniff as anything else raise
``NotImplementedError`` naming the plug-in point. ``fake=True`` keeps
the deterministic md5-derived features for format-agnostic plumbing
tests.

Scale: binary payloads make wide rows — the operators keep payloads out
of shuffles (features are computed in a map-only stage, then the bytes
are dropped before any wide transformation), and the asset table would
be written with small row groups like the reference's fat-text tables
(convert_s2ag.py:37-70).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


# --- real decoders (dependency-free formats) --------------------------------


def _read_pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, raster_offset) for P5/P6."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(data):
            c = data[pos : pos + 1]
            if c == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        return data[start:pos]

    magic = token()
    width, height, maxval = int(token()), int(token()), int(token())
    # exactly one whitespace separator after maxval per spec; tolerate the
    # common out-of-spec CRLF from Windows writers (a raster may begin
    # with byte 0x0A, so never skip more than this)
    if data[pos : pos + 2] == b"\r\n":
        pos += 2
    else:
        pos += 1
    return magic, width, height, maxval, pos


def _pil_decode(data: bytes) -> np.ndarray | None:
    """Compressed-format upgrade path: decode via PIL when it is
    importable (the plug-in the NotImplementedError below names). Probe
    and decode both executor-side; any failure degrades to None so the
    caller's format dispatch continues unchanged."""
    from science_datalake_spark.models import optional_import

    pil_image = optional_import("PIL.Image")
    if pil_image is None:
        return None
    try:
        img = pil_image.open(io.BytesIO(data))
        if img.mode not in ("L", "RGB"):
            img = img.convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except Exception:
        return None


def decode_image(data: bytes) -> np.ndarray | None:
    """PPM (P6) → (H, W, 3) uint8; PGM (P5) → (H, W) uint8. Non-PNM
    payloads try the PIL upgrade path (JPEG/PNG/... when the library is
    present); None if nothing can decode it."""
    if not data[:2] in (b"P5", b"P6"):
        return _pil_decode(data)
    try:
        magic, w, h, maxval, off = _read_pnm_header(data)
        channels = 3 if magic == b"P6" else 1
        if maxval > 255 or w <= 0 or h <= 0:
            return None  # 16-bit or degenerate-dimension PNM rejected
        raster = np.frombuffer(data, dtype=np.uint8, count=w * h * channels, offset=off)
        return raster.reshape((h, w, 3)) if channels == 3 else raster.reshape((h, w))
    except (ValueError, struct.error):
        return None


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 → binary PNM bytes."""
    if img.ndim == 3:
        header = f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    else:
        header = f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    return header + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via index arrays (pure numpy)."""
    rows = np.round(np.linspace(0, img.shape[0] - 1, height)).astype(int)
    cols = np.round(np.linspace(0, img.shape[1] - 1, width)).astype(int)
    return img[rows][:, cols]


def decode_wav(data: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAV → (mono float32 samples in [-1,1], sample_rate); None if
    not a WAV or not 8/16-bit PCM."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data)) as wf:
            rate = wf.getframerate()
            n = wf.getnframes()
            raw = wf.readframes(n)
            width = wf.getsampwidth()
            channels = wf.getnchannels()
        if width == 2:
            samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        elif width == 1:
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            return None
        if channels > 1:
            samples = samples.reshape(-1, channels).mean(axis=1)
        return samples, rate
    except (wave.Error, EOFError, ValueError):
        return None


def image_features(img: np.ndarray) -> list[float]:
    """16 floats: mean RGB (3) + std RGB (3) + 8-bin luminance histogram
    (normalized) + width/4096 + height/4096."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    px = img.reshape(-1, 3).astype(np.float32) / 255.0
    lum = px.mean(axis=1)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    hist = hist / max(lum.size, 1)
    out = [
        *px.mean(axis=0).tolist(),
        *px.std(axis=0).tolist(),
        *hist.tolist(),
        img.shape[1] / 4096.0,
        img.shape[0] / 4096.0,
    ]
    return [float(v) for v in out]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """16 floats: duration_s/3600, rms, peak, zero-crossing rate + 12-bin
    normalized magnitude spectrum. Degenerate-but-valid WAVs (zero frames,
    zero rate) yield an all-zero vector instead of crashing the task."""
    if samples.size == 0 or rate <= 0:
        return [0.0] * FEATURE_DIM
    rms = float(np.sqrt(np.mean(samples**2)))
    peak = float(np.max(np.abs(samples)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if samples.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(samples))
    bins = np.array_split(spec, 12)
    energies = np.array([b.mean() if b.size else 0.0 for b in bins])
    total = energies.sum() or 1.0
    return [
        float(samples.size / rate / 3600.0),
        rms,
        peak,
        zcr,
        *(energies / total).astype(float).tolist(),
    ]


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic md5-derived stand-in (format-agnostic plumbing path)."""
    digest = hashlib.md5(payload).digest()
    return [(b - 128) / 128.0 for b in digest[:FEATURE_DIM]]


def _real_features(payload: bytes) -> list[float]:
    img = decode_image(payload)
    if img is not None:
        return image_features(img)
    wav = decode_wav(payload)
    if wav is not None:
        return audio_features(*wav)
    raise NotImplementedError(
        "payload is neither binary PNM nor PCM WAV — compressed formats "
        "(JPEG/PNG/MP3/video) need PIL/ffmpeg; plug the decoder in here"
    )


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize binary assets via mapInPandas (map-only stage; no
    shuffle of payload bytes; output drops the payload).

    ``fake=False`` runs the real decoders (PNM images, WAV audio) and
    raises on formats that need external libraries."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        featurize = _fake_features if fake else _real_features
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(lambda p: featurize(bytes(p))),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(
    assets: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image resize through mapInPandas. ``fake=False`` decodes PNM
    payloads, nearest-neighbor-resamples with numpy, re-encodes, and
    updates the metadata struct; non-PNM payloads raise (the PIL plug-in
    point). ``fake=True`` updates only the metadata (plumbing path)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if not fake:

                def do_resize(payload: bytes) -> bytes:
                    img = decode_image(bytes(payload))
                    if img is None:
                        raise NotImplementedError(
                            "non-PNM image resize needs PIL; plug it in here"
                        )
                    return encode_ppm(resize_nearest(img, width, height))

                pdf["payload"] = pdf["payload"].map(do_resize)
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf

    return assets.mapInPandas(batches, schema=ASSET_SCHEMA)


#: backwards-compatible alias (the round-1 name)
resize_stub = resize_images


def sample_assets(spark: SparkSession, n: int = 32) -> DataFrame:
    """Deterministic binary fixture (payload = repeated md5 bytes —
    exercises the fake/plumbing path)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"asset-{i}".encode()).digest() * (4 + i % 5)
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, kind, bytearray(payload), ("application/octet-stream", 64, 64, 1000 + i))
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def sample_image_assets(spark: SparkSession, n: int = 8, size: int = 16) -> DataFrame:
    """Real PPM fixture: deterministic per-asset color gradients."""
    rows = []
    for i in range(n):
        y, x = np.mgrid[0:size, 0:size]
        img = np.stack(
            [
                ((x * (i + 1) * 17) % 256),
                ((y * (i + 3) * 11) % 256),
                ((x + y + i * 29) % 256),
            ],
            axis=-1,
        ).astype(np.uint8)
        rows.append(
            (i, "image", bytearray(encode_ppm(img)), ("image/x-portable-pixmap", size, size, None))
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def sample_wav_assets(spark: SparkSession, n: int = 4, rate: int = 8000) -> DataFrame:
    """Real WAV fixture: deterministic sine tones at distinct frequencies."""
    rows = []
    for i in range(n):
        t = np.arange(rate // 4) / rate  # 250 ms
        tone = (np.sin(2 * np.pi * (220 * (i + 1)) * t) * 0.5 * 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(tone.tobytes())
        rows.append((i, "audio", bytearray(buf.getvalue()), ("audio/wav", None, None, 250)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# --- video: frame splitting + sampling --------------------------------------

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def split_pnm_stream(data: bytes) -> list[bytes] | None:
    """Parse a concatenated-PNM video stream (the dependency-free 'video'
    container ffmpeg itself emits/reads as ``image2pipe -vcodec ppm``):
    back-to-back P5/P6 frames. Returns frame byte slices, or None if the
    payload doesn't start with a PNM magic."""
    if data[:2] not in (b"P5", b"P6"):
        return None
    frames: list[bytes] = []
    pos = 0
    try:
        while pos < len(data) and data[pos : pos + 2] in (b"P5", b"P6"):
            magic, w, h, maxval, off = _read_pnm_header(data[pos:])
            if maxval > 255 or w <= 0 or h <= 0:
                return None
            size = off + w * h * (3 if magic == b"P6" else 1)
            if pos + size > len(data):
                return None  # truncated frame
            frames.append(data[pos : pos + size])
            pos += size
    except (ValueError, struct.error):
        return None
    return frames or None


def _uniform_indices(n_total: int, n_sample: int) -> list[int]:
    """Deterministic uniform frame pick: n_sample positions spread over
    [0, n_total): floor(i * n_total / n_sample)."""
    n_sample = min(n_sample, n_total)
    return sorted({(i * n_total) // n_sample for i in range(n_sample)})


def sample_frames(assets: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """Frame-sample video payloads through mapInPandas: one row per KEPT
    frame — (asset_id, frame_idx, n_frames, width, height, features) —
    with frames picked uniformly over the clip.

    ``fake=False`` parses concatenated-PNM streams for real (each sampled
    frame is decoded and featurized via image_features); any other
    payload raises at the named ffmpeg plug-in point. ``fake=True`` emits
    ``n_frames`` deterministic md5-derived rows per asset — the plumbing
    path proving the one-input-row→many-output-rows batch shape without
    decode libraries.

    Scale: map-only (no shuffle of payload bytes); output rows carry only
    features + dimensions, never frame bytes, so anything downstream of
    the sampling stage is narrow."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "n_frames": [],
                "width": [], "height": [], "features": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                if fake:
                    total = n_frames
                    for idx in range(n_frames):
                        digest = hashlib.md5(data + bytes([idx])).digest()
                        out["asset_id"].append(aid)
                        out["frame_idx"].append(idx)
                        out["n_frames"].append(total)
                        out["width"].append(None)
                        out["height"].append(None)
                        out["features"].append(
                            [(b - 128) / 128.0 for b in digest[:FEATURE_DIM]]
                        )
                    continue
                frames = split_pnm_stream(data)
                if frames is None:
                    raise NotImplementedError(
                        "payload is not a concatenated-PNM stream — real video "
                        "containers (mp4/webm/mkv) need ffmpeg; plug the "
                        "demuxer in here"
                    )
                for idx in _uniform_indices(len(frames), n_frames):
                    img = decode_image(frames[idx])
                    if img is None:
                        # a frame whose header re-parse fails would otherwise
                        # surface as an executor AttributeError on img.shape
                        raise ValueError(
                            f"asset {aid!r}: frame {idx} of {len(frames)} "
                            "split from the PNM stream failed to decode"
                        )
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(len(frames))
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["features"].append(image_features(img))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def sample_video_assets(
    spark: SparkSession, n: int = 4, frames: int = 10, size: int = 8
) -> DataFrame:
    """Real concatenated-PNM 'video' fixture: per-asset clips whose frames
    brighten linearly over time (so sampled features are checkable)."""
    rows = []
    for i in range(n):
        clip = b""
        for f in range(frames):
            val = min(255, (f * 255) // max(frames - 1, 1))
            img = np.full((size, size, 3), val, dtype=np.uint8)
            clip += encode_ppm(img)
        rows.append(
            (i, "video", bytearray(clip), ("video/x-pnm-stream", size, size, frames * 40))
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# --- perceptual hashing: modality-aware near-dup fingerprints ---------------

PHASH_BITS = 64


def image_dhash(img: np.ndarray, bits: int = PHASH_BITS) -> str:
    """Difference hash (dHash): luminance → nearest-resample to a
    (side+1)×side grid → one bit per horizontal gradient sign. The
    standard crawl-image near-dup fingerprint: invariant to uniform
    brightness shifts and any resize that preserves gradient signs,
    unlike a byte hash which a 1-pixel re-encode defeats. Returned as a
    '0'/'1' bit string so the SimHash band machinery
    (dedup.simhash_candidate_pairs) consumes it unchanged."""
    side = int(bits**0.5)
    if side * side != bits:
        raise ValueError("bits must be a perfect square (8x8 default)")
    lum = img.astype(np.float32).mean(axis=2) if img.ndim == 3 else img.astype(np.float32)
    small = resize_nearest(lum, side + 1, side)
    grad = small[:, 1:] > small[:, :-1]
    return "".join("1" if b else "0" for b in grad.reshape(-1))


def audio_envelope_hash(
    samples: np.ndarray, rate: int, bits: int = PHASH_BITS
) -> str:
    """Energy-envelope hash: the mono signal is split into ``bits`` equal
    time windows; each bit is that window's RMS vs the per-clip median
    RMS. Invariant to amplitude scaling (both sides of the comparison
    scale together) and to codec-level noise far below the envelope;
    sensitive to structure (silence/attack patterns). Degenerate clips
    (empty / all-constant) hash to all-zeros."""
    if samples.size == 0 or rate <= 0:
        return "0" * bits
    windows = np.array_split(samples.astype(np.float32), bits)
    rms = np.array([np.sqrt(np.mean(w**2)) if w.size else 0.0 for w in windows])
    med = np.median(rms)
    return "".join("1" if v > med else "0" for v in rms)


def _fake_hash(payload: bytes, bits: int = PHASH_BITS) -> str:
    """md5-derived stand-in for the format-agnostic plumbing path."""
    digest = hashlib.md5(payload).digest()
    return "".join(f"{b:08b}" for b in digest)[:bits]


def _real_hash(payload: bytes, bits: int = PHASH_BITS) -> str:
    img = decode_image(payload)
    if img is not None:
        return image_dhash(img, bits)
    wav = decode_wav(payload)
    if wav is not None:
        return audio_envelope_hash(*wav, bits=bits)
    frames = split_pnm_stream(payload)
    if frames:  # video: dHash of the middle frame (scene-representative)
        mid = decode_image(frames[len(frames) // 2])
        if mid is not None:
            return image_dhash(mid, bits)
    raise NotImplementedError(
        "payload is neither PNM, PCM WAV, nor a PNM stream — compressed "
        "formats (JPEG/PNG/MP3/video) need PIL/ffmpeg; plug the decoder in here"
    )


PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("simhash", StringType()),
    ]
)


def perceptual_hashes(
    assets: DataFrame, fake: bool = True, bits: int = PHASH_BITS
) -> DataFrame:
    """Per-asset perceptual fingerprint (``simhash`` bit-string column) via
    mapInPandas — the multimodal twin of the text SimHash stage. Map-only;
    payload bytes never reach a shuffle (dropped in the same stage that
    reads them). ``fake=False`` runs the real decoders (PNM/WAV/PNM-stream)
    and raises at the named plug-in point for compressed formats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hasher = _fake_hash if fake else _real_hash
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "simhash": pdf["payload"].map(lambda p: hasher(bytes(p), bits)),
                }
            )

    return assets.mapInPandas(batches, schema=PHASH_SCHEMA)


def asset_near_dup_pairs(
    hashes: DataFrame,
    bands: int = 8,
    max_hamming: int = 6,
    bits: int = PHASH_BITS,
) -> DataFrame:
    """Near-duplicate asset pairs from perceptual hashes: delegates to the
    SimHash band-bucket + exact-Hamming machinery
    (dedup.simhash_candidate_pairs — same pigeonhole recall guarantee,
    same O(Σ bucket²) bound, never all-pairs), scoped by ``kind`` so
    cross-modality hash coincidences never pair (and modality shrinks
    the buckets). One self-join; pairs carry their ``kind``."""
    from science_datalake_spark.operators.dedup import simhash_candidate_pairs

    return simhash_candidate_pairs(
        hashes.select("asset_id", "kind", "simhash"),
        "asset_id",
        bits=bits,
        bands=bands,
        max_hamming=max_hamming,
        scope_cols=("kind",),
    )
