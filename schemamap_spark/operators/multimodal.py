"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata, processed via
Arrow-batched `mapInPandas` — the right shape for 100 TB of media: the binary
payload never leaves the executor, batches stream through Python with Arrow
zero-copy, and the output schema is fixed so downstream stays relational.

The actual decode (PIL/ffmpeg/torchaudio) is NOT available in this container,
so `decode` is stubbed: by default it raises NotImplementedError; with
`fake=True` it derives deterministic pseudo-metadata from the bytes so the
plumbing (schema, batching, partitioning) is fully testable. The interface —
iterator-of-DataFrames in/out, fixed output StructType — is exactly what a
real decoder drops into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType([
    T.StructField("image_id", T.LongType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum_mod", T.LongType()),
])


def decode_images(images: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload column → typed metadata rows (DECODED_SCHEMA).

    Real decoding requires an imaging library absent from this container;
    pass fake=True for the deterministic stub (tests / oracle).

    The batch function is deliberately SELF-CONTAINED (no references to this
    module's globals): cloudpickle then serializes it by value, so Python
    workers never need `schemamap_spark` importable on their own path — a
    hard requirement when the engine is driven from an arbitrary cwd."""
    if not fake:
        # Real decoding is NOT implemented (no imaging stack in this
        # container); raise unconditionally rather than silently returning
        # the stub's pseudo-metadata as if it were a genuine decode.
        raise NotImplementedError(
            "real image decode is not implemented; plug a PIL/ffmpeg batch "
            "function into the mapInPandas slot below, or pass fake=True "
            "for the deterministic plumbing stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            checksum = pdf["payload"].map(lambda b: sum(b) % 997)
            yield _pd.DataFrame({
                "image_id": pdf["image_id"],
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "n_bytes": n_bytes.astype("int64"),
                "width": (n_bytes % 640).astype("int32"),
                "height": (n_bytes % 480).astype("int32"),
                "checksum_mod": checksum.astype("int64"),
            })

    return images.mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.LongType()),
    T.StructField("frame_no", T.IntegerType()),
    T.StructField("n_frames_total", T.IntegerType()),
    T.StructField("frame_bytes", T.BinaryType()),
])

_FAKE_FRAME_SIZE = 256  # fake decoder: payload = concatenated 256-byte frames


def sample_frames(video: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Video payloads → one row per sampled frame (frames 0, n, 2n, …).

    Row-EXPANDING mapInPandas: a batch of videos yields a larger batch of
    frames — the shape a real ffmpeg decoder needs (frame count unknown until
    decode). With ``fake=True`` the deterministic stub treats the payload as
    concatenated 256-byte pseudo-frames so sampling arithmetic, expansion and
    schema are fully testable; ``fake=False`` raises (no ffmpeg here) rather
    than passing stub frames off as real."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if not fake:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg bindings; the contract is "
            "mapInPandas(payload) -> rows(video_id, frame_no, n_frames_total, "
            "frame_bytes) — pass fake=True for the deterministic plumbing stub"
        )

    size, step = _FAKE_FRAME_SIZE, every_n

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {"video_id": [], "frame_no": [], "n_frames_total": [], "frame_bytes": []}
            for vid, payload in zip(pdf["video_id"], pdf["payload"]):
                total = max(1, len(payload) // size)
                for f in range(0, total, step):
                    out["video_id"].append(vid)
                    out["frame_no"].append(f)
                    out["n_frames_total"].append(total)
                    out["frame_bytes"].append(bytes(payload[f * size : (f + 1) * size]))
            yield _pd.DataFrame(out)

    return video.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("image_id", T.LongType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(images: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image payloads → fixed-dimension payloads (the normalize-before-embed
    step every vision pipeline runs). Fake stub emits a deterministic
    byte-repeat surrogate of exactly width*height*3 bytes so downstream batch
    shapes are real; fake=False raises (no imaging stack)."""
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    if not fake:
        raise NotImplementedError(
            "real image resize needs PIL/opencv; pass fake=True for the "
            "deterministic plumbing stub"
        )

    w, h = width, height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n_out = w * h * 3
        for pdf in batches:
            # null/empty payloads (failed upstream decode) still honor the
            # fixed-size contract: zero-filled surrogate, never a short array
            resized = pdf["payload"].map(
                lambda b: bytes(((b or b"\x00") * (n_out // max(1, len(b or b"\x00")) + 1))[:n_out])
            )
            yield _pd.DataFrame({
                "image_id": pdf["image_id"],
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "width": _pd.Series([w] * len(pdf), dtype="int32"),
                "height": _pd.Series([h] * len(pdf), dtype="int32"),
                "n_bytes": _pd.Series([n_out] * len(pdf), dtype="int64"),
                "payload": resized,
            })

    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("audio_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("duration_s_est", T.DoubleType()),
    T.StructField("mean_level", T.DoubleType()),
    T.StructField("crossing_rate", T.DoubleType()),
])


def extract_audio_features(audio: DataFrame, sample_rate: int = 16000, fake: bool = False) -> DataFrame:
    """Audio payloads → per-clip scalar features (duration, level, crossing
    rate) — the triage stats a speech-corpus filter runs before ASR. Fake
    stub computes them on raw bytes (numpy-vectorized, deterministic);
    fake=False raises (no torchaudio/soundfile here)."""
    if not fake:
        raise NotImplementedError(
            "real audio decode needs soundfile/torchaudio; pass fake=True "
            "for the deterministic plumbing stub"
        )

    sr = sample_rate

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            feats = {"audio_id": pdf["audio_id"], "n_bytes": [], "duration_s_est": [],
                     "mean_level": [], "crossing_rate": []}
            for b in pdf["payload"]:
                a = _np.frombuffer(bytes(b), dtype=_np.uint8).astype(_np.int16) - 128
                n = len(a)
                feats["n_bytes"].append(n)
                feats["duration_s_est"].append(round(n / sr, 6))
                feats["mean_level"].append(round(float(_np.abs(a).mean()) if n else 0.0, 6))
                cross = int((_np.signbit(a[1:]) != _np.signbit(a[:-1])).sum()) if n > 1 else 0
                feats["crossing_rate"].append(round(cross / max(1, n - 1), 6))
            yield _pd.DataFrame(feats)

    return audio.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
