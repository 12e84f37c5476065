"""Multimodal (image/audio/video) column operators.

Media is modeled as opaque ``binary`` payload columns plus typed metadata
(the ``media_ref`` spans of the docs table point into this store).  The
Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
iterator signatures, partition strategy — is real and tested; the actual
codec work (JPEG decode, audio resample, video frame extraction) is
STUBBED because no image/audio libraries exist in this environment:

* ``decode_image`` raises ``NotImplementedError`` when ``real=True``;
* the default "fake decoder" derives deterministic pseudo-pixels from the
  payload bytes (xxhash-free, pure numpy) so downstream feature shapes,
  batching and joins are exercised end-to-end with stable goldens.

Swap ``_fake_decode`` for a PIL/ffmpeg call on a real cluster — the
DataFrame-level contract does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_ref STRING, mime STRING, width INT, height INT, n_bytes INT, payload BINARY"
)

FEATURE_SCHEMA = (
    "media_ref STRING, mime STRING, feat ARRAY<FLOAT>, mean_lum DOUBLE, n_frames INT"
)


def synthetic_media(spark: SparkSession, refs: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic media store for a media_ref column (payload bytes are
    a seeded function of the ref string)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref in pdf["media_ref"]:
                # zlib.crc32: process-independent determinism (python hash()
                # varies with PYTHONHASHSEED)
                import zlib

                h = zlib.crc32(f"{seed}:{ref}".encode()) % (2**31)
                rng = np.random.default_rng(h)
                w, hgt = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
                out.append((ref, "image/jpeg", w, hgt, len(payload), payload))
            yield pd.DataFrame(
                out, columns=["media_ref", "mime", "width", "height", "n_bytes", "payload"]
            )

    return refs.select("media_ref").distinct().mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: expands payload bytes
    into a (height, width) luminance plane.  REPLACE with a real decoder
    (PIL/turbojpeg) outside this sandbox."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / raw.size))
    return np.tile(raw, reps)[: width * height].reshape(height, width).astype(np.float64)


def extract_image_features(
    media: DataFrame, n_features: int = 16, real: bool = False
) -> DataFrame:
    """Per-image feature extraction over Arrow batches (mapInPandas).

    Features: ``n_features`` histogram bins of the luminance plane + mean
    luminance.  With ``real=True`` this is where a genuine decoder would
    run — explicitly not implemented in this environment.
    """
    if real:
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg — not available in this sandbox"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                plane = _fake_decode(r.payload, r.width, r.height)
                hist, _ = np.histogram(plane, bins=n_features, range=(0, 256))
                feat = (hist / plane.size).astype(np.float32)
                rows.append((r.media_ref, r.mime, feat.tolist(), float(plane.mean()), 1))
            yield pd.DataFrame(
                rows, columns=["media_ref", "mime", "feat", "mean_lum", "n_frames"]
            )

    return media.mapInPandas(feats, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, real: bool = False) -> DataFrame:
    """Video frame sampling: emits one row per sampled frame index.

    Stub: frame count derived from payload size; a real implementation
    would demux with ffmpeg.  The explode/fan-out shape (one input row ->
    many frame rows) is the part that matters for the Spark plan.
    """
    if real:
        raise NotImplementedError("real video demux requires ffmpeg — not in this sandbox")
    return (
        media.withColumn("n_frames_total", (F.col("n_bytes") / 8).cast("int"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames_total") - 1, F.lit(0)), F.lit(every_n))),
        )
        .select("media_ref", "mime", "frame_idx")
    )


def resize_image(
    media: DataFrame, out_w: int = 16, out_h: int = 16, real: bool = False
) -> DataFrame:
    """Image resize over Arrow batches: decode -> nearest-neighbor
    resample -> re-emitted payload with updated metadata (same MEDIA
    schema, so resize composes with every other media operator).  The
    resample is pure numpy on the fake-decoded luminance plane; ``real``
    would swap in PIL's decoder + resampler."""
    if real:
        raise NotImplementedError(
            "real image resize requires PIL — not available in this sandbox"
        )

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                plane = _fake_decode(r.payload, r.width, r.height)
                ys = (np.arange(out_h) * (plane.shape[0] / out_h)).astype(int)
                xs = (np.arange(out_w) * (plane.shape[1] / out_w)).astype(int)
                small = plane[ys][:, xs].astype(np.uint8)
                rows.append(
                    (r.media_ref, "image/raw-lum", out_w, out_h, small.size, small.tobytes())
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "mime", "width", "height", "n_bytes", "payload"]
            )

    return media.mapInPandas(rz, MEDIA_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_ref STRING, n_samples INT, rms DOUBLE, zero_crossings INT, duration_sec DOUBLE"
)


def audio_features(
    media: DataFrame, sample_rate: int = 16000, real: bool = False
) -> DataFrame:
    """Audio feature extraction: payload -> PCM -> RMS / zero-crossing /
    duration.  The PCM "decode" reinterprets payload bytes as int8 samples
    (deterministic stand-in; ``real`` would demux/resample with ffmpeg) —
    the batch shape, schema, and downstream joins are the real contract."""
    if real:
        raise NotImplementedError(
            "real audio decode requires ffmpeg/soundfile — not in this sandbox"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pcm = np.frombuffer(r.payload, dtype=np.int8).astype(np.float64) / 128.0
                zc = int(np.count_nonzero(np.diff(np.signbit(pcm))))
                rows.append(
                    (
                        r.media_ref,
                        pcm.size,
                        float(np.sqrt(np.mean(pcm * pcm))) if pcm.size else 0.0,
                        zc,
                        pcm.size / float(sample_rate),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "n_samples", "rms", "zero_crossings", "duration_sec"],
            )

    return media.mapInPandas(feats, AUDIO_FEATURE_SCHEMA)


def join_docs_with_media_features(
    spark: SparkSession, passthrough: DataFrame, seed: int = 42
) -> DataFrame:
    """End-to-end multimodal path: media spans -> media store -> features,
    joined back to (doc_id, offset) so text and media features align."""
    refs = passthrough.filter(F.col("kind") == "media").select("doc_id", "offset", "media_ref")
    media = synthetic_media(spark, refs, seed)
    feats = extract_image_features(media)
    return refs.join(feats, "media_ref").select(
        "doc_id", "offset", "media_ref", "feat", "mean_lum"
    )
