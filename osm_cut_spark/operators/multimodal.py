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

``real=True`` is IMPORT-GUARDED, not hard-disabled: each operator probes
for the library it needs (PIL for images, ffmpeg/ffprobe for audio/video)
and runs the genuine decoder when present — the ``NotImplementedError``
fires only when the library is truly absent (as in this sandbox).  The
identical code therefore works unmodified on a real cluster where the
libs are installed on the executors.
"""

from __future__ import annotations

import shutil
import subprocess
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F


def _pil_module():
    """PIL.Image if pillow is importable, else None (probed on the worker
    at UDF build time on the driver; executors need pillow too)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _ffmpeg_path(tool: str = "ffmpeg"):
    """Absolute path of ffmpeg/ffprobe, or None when not installed."""
    return shutil.which(tool)

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


def _pil_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real image decoder: PIL open -> luminance plane.  Only reached when
    ``_pil_module()`` found pillow; the (width, height) metadata columns are
    advisory — the decoded image's own dimensions win."""
    import io  # noqa: PLC0415

    Image = _pil_module()
    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("L"), dtype=np.float64)


def extract_image_features(
    media: DataFrame, n_features: int = 16, real: bool = False
) -> DataFrame:
    """Per-image feature extraction over Arrow batches (mapInPandas).

    Features: ``n_features`` histogram bins of the luminance plane + mean
    luminance.  ``real=True`` decodes the payload with PIL (import-guarded:
    raises only when pillow is absent, as in this sandbox).
    """
    decode = _fake_decode
    if real:
        if _pil_module() is None:
            raise NotImplementedError(
                "real image decode requires pillow (PIL) on driver + executors"
            )
        decode = _pil_decode

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                plane = decode(r.payload, r.width, r.height)
                hist, _ = np.histogram(plane, bins=n_features, range=(0, 256))
                feat = (hist / plane.size).astype(np.float32)
                rows.append((r.media_ref, r.mime, feat.tolist(), float(plane.mean()), 1))
            yield pd.DataFrame(
                rows, columns=["media_ref", "mime", "feat", "mean_lum", "n_frames"]
            )

    return media.mapInPandas(feats, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, real: bool = False) -> DataFrame:
    """Video frame sampling: emits one row per sampled frame index.

    Fake mode derives frame count from payload size; ``real=True`` probes
    the container with ffprobe (import-guarded: raises only when ffprobe is
    absent).  The explode/fan-out shape (one input row -> many frame rows)
    is the part that matters for the Spark plan, and is identical in both
    modes.
    """
    if real:
        ffprobe = _ffmpeg_path("ffprobe")
        if ffprobe is None:
            raise NotImplementedError(
                "real video demux requires ffmpeg/ffprobe on driver + executors"
            )

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for r in pdf.itertuples():
                    out = subprocess.run(
                        [
                            ffprobe, "-v", "error", "-select_streams", "v:0",
                            "-count_packets", "-show_entries",
                            "stream=nb_read_packets", "-of", "csv=p=0", "-",
                        ],
                        input=bytes(r.payload),
                        capture_output=True,
                        check=False,
                    )
                    # surface decode failures instead of fabricating a
                    # frame_idx=0 row from empty output (round-6 ADVICE):
                    # corrupt media must be observable, not silently counted
                    if out.returncode != 0 or not out.stdout.strip():
                        raise RuntimeError(
                            f"ffprobe failed for {r.media_ref!r} "
                            f"(rc={out.returncode}): "
                            f"{out.stderr.decode(errors='replace')[:500]}"
                        )
                    n = int(out.stdout.decode().strip())
                    for idx in range(0, max(n, 1), every_n):
                        rows.append((r.media_ref, r.mime, idx))
                yield pd.DataFrame(rows, columns=["media_ref", "mime", "frame_idx"])

        return media.mapInPandas(probe, "media_ref STRING, mime STRING, frame_idx INT")
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
    resample is pure numpy on the decoded luminance plane; ``real=True``
    swaps in PIL's decoder (import-guarded: raises only when pillow is
    absent)."""
    decode = _fake_decode
    if real:
        if _pil_module() is None:
            raise NotImplementedError(
                "real image resize requires pillow (PIL) on driver + executors"
            )
        decode = _pil_decode

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                plane = decode(r.payload, r.width, r.height)
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
    duration.  Fake mode reinterprets payload bytes as int8 samples;
    ``real=True`` demuxes/resamples with ffmpeg to mono s16le PCM at
    ``sample_rate`` (import-guarded: raises only when ffmpeg is absent).
    The batch shape, schema, and downstream joins are identical either
    way."""
    ffmpeg = _ffmpeg_path("ffmpeg") if real else None
    if real and ffmpeg is None:
        raise NotImplementedError(
            "real audio decode requires ffmpeg on driver + executors"
        )

    def _decode_pcm(payload: bytes) -> np.ndarray:
        if ffmpeg is None:
            return np.frombuffer(payload, dtype=np.int8).astype(np.float64) / 128.0
        out = subprocess.run(
            [
                ffmpeg, "-v", "error", "-i", "-", "-f", "s16le",
                "-ac", "1", "-ar", str(sample_rate), "-",
            ],
            input=payload,
            capture_output=True,
            check=False,
        )
        # a corrupt/undecodable payload must fail loudly, not flow on as
        # zero-length PCM (rms over an empty array -> NaN/warning,
        # silently) — round-6 ADVICE
        if out.returncode != 0 or not out.stdout:
            raise RuntimeError(
                f"ffmpeg decode failed (rc={out.returncode}): "
                f"{out.stderr.decode(errors='replace')[:500]}"
            )
        return np.frombuffer(out.stdout, dtype=np.int16).astype(np.float64) / 32768.0

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pcm = _decode_pcm(bytes(r.payload))
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
