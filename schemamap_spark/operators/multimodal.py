"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata, processed via
Arrow-batched `mapInPandas` — the right shape for 100 TB of media: the binary
payload never leaves the executor, batches stream through Python with Arrow
zero-copy, and the output schema is fixed so downstream stays relational.

What is REAL here, with zero external dependencies:
- `decode_images(fake=False)` — container-level decode: magic-byte format
  sniffing + true width/height parsed from the PNG IHDR, GIF logical
  screen descriptor, BMP info header, and JPEG SOF marker, plus a real
  byte checksum. Unrecognized/corrupt payloads yield NULL dims instead of
  failing the job (at 100 TB one bad file must not kill the scan).
- `extract_audio_features(fake=False)` — real PCM decode of RIFF/WAVE
  payloads via the stdlib `wave` module: exact duration from the header,
  mean level and zero-crossing rate over the actual samples (8/16-bit,
  multi-channel averaged). Non-WAV payloads yield NULL features.

What still honestly raises: pixel-level decompression (resize) and video
frame extraction — those need PIL/ffmpeg, absent from this container; with
`fake=True` every operator instead derives deterministic pseudo-data from
the bytes so the plumbing (schema, batching, partitioning) stays fully
testable, and the oracle rows ride the fake path for engine-portable
values. The interface — iterator-of-DataFrames in/out, fixed output
StructType — is exactly what a full decoder drops into.
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

    fake=False (default) is a REAL container-level decode, pure stdlib:
    the format is sniffed from magic bytes and true dimensions are parsed
    from the PNG IHDR chunk, GIF logical screen descriptor, BMP info
    header, or JPEG SOF0-SOF15 marker; `fmt` reports the SNIFFED format
    (not the claimed column) and `checksum_mod` is computed over the
    actual bytes. Rows whose payload matches no known container get NULL
    fmt/dims — corrupt files surface as rows, never as job failures.
    Pixel-level decompression is NOT performed (no imaging stack here);
    dims from headers are exact regardless. fake=True keeps the
    deterministic pseudo-metadata stub (engine-portable oracle values).

    The batch function is deliberately SELF-CONTAINED (no references to this
    module's globals): cloudpickle then serializes it by value, so Python
    workers never need `schemamap_spark` importable on their own path — a
    hard requirement when the engine is driven from an arbitrary cwd."""
    if fake:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pandas as _pd

            for pdf in batches:
                n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
                checksum = pdf["payload"].map(
                    lambda b: sum(b) % 997 if b is not None else 0
                )
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def sniff(b: bytes):
            """(fmt, width, height) from container headers; Nones if not a
            recognized/intact container. Public format specs only."""
            n = len(b)
            if n >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
                return (
                    "png",
                    int.from_bytes(b[16:20], "big"),
                    int.from_bytes(b[20:24], "big"),
                )
            if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
                return (
                    "gif",
                    int.from_bytes(b[6:8], "little"),
                    int.from_bytes(b[8:10], "little"),
                )
            if n >= 26 and b[:2] == b"BM":
                hdr = int.from_bytes(b[14:18], "little")
                if hdr >= 40:  # BITMAPINFOHEADER and later
                    return (
                        "bmp",
                        int.from_bytes(b[18:22], "little", signed=True),
                        abs(int.from_bytes(b[22:26], "little", signed=True)),
                    )
                if hdr == 12:  # BITMAPCOREHEADER: 16-bit dims
                    return (
                        "bmp",
                        int.from_bytes(b[18:20], "little"),
                        int.from_bytes(b[20:22], "little"),
                    )
                return ("bmp", None, None)
            if n >= 4 and b[:2] == b"\xff\xd8":
                i = 2
                while i + 9 <= n:
                    if b[i] != 0xFF:
                        break
                    marker = b[i + 1]
                    if marker == 0xFF:  # fill byte
                        i += 1
                        continue
                    if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                        i += 2  # standalone markers carry no length
                        continue
                    if marker == 0xDA:
                        # start-of-scan: entropy-coded data follows, which is
                        # not segment-structured — walking it could false-
                        # match a SOF pattern and report garbage dims. A
                        # well-formed JPEG carries SOF before SOS, so reaching
                        # here means dims are genuinely absent.
                        break
                    if i + 4 > n:
                        break
                    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        if i + 9 <= n:
                            return (
                                "jpeg",
                                int.from_bytes(b[i + 7 : i + 9], "big"),
                                int.from_bytes(b[i + 5 : i + 7], "big"),
                            )
                        break
                    if seglen < 2:
                        break
                    i += 2 + seglen
                return ("jpeg", None, None)
            return (None, None, None)

        for pdf in batches:
            out = {"image_id": pdf["image_id"], "doc_id": pdf["doc_id"],
                   "fmt": [], "n_bytes": [], "width": [], "height": [],
                   "checksum_mod": []}
            for b in pdf["payload"]:
                b = bytes(b) if b is not None else b""
                fmt, w, h = sniff(b)
                out["fmt"].append(fmt)
                out["n_bytes"].append(len(b))
                out["width"].append(w)
                out["height"].append(h)
                out["checksum_mod"].append(sum(b) % 997)
            yield _pd.DataFrame(out).astype(
                {"n_bytes": "int64", "width": "Int32", "height": "Int32",
                 "checksum_mod": "int64"}
            )

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
    rate) — the triage stats a speech-corpus filter runs before ASR.

    fake=False (default) REALLY decodes RIFF/WAVE payloads via the stdlib
    `wave` module: exact duration from the header (sample_rate param is
    ignored — the real rate is in the file), mean |level| normalized to
    [0,1] against int16 full scale, and the zero-crossing rate over the
    actual PCM samples (8/16-bit supported, channels averaged). Non-WAV
    or corrupt payloads yield NULL features (never a job failure);
    compressed codecs (mp3/flac/ogg) genuinely need external decoders and
    land in the NULL bucket too. fake=True keeps the deterministic
    raw-byte stub (engine-portable oracle values)."""
    if not fake:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io
            import wave

            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                feats = {"audio_id": pdf["audio_id"], "n_bytes": [],
                         "duration_s_est": [], "mean_level": [],
                         "crossing_rate": []}
                for b in pdf["payload"]:
                    b = bytes(b) if b is not None else b""
                    feats["n_bytes"].append(len(b))
                    dur = lvl = zcr = None
                    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        try:
                            with wave.open(io.BytesIO(b)) as w:
                                nch = w.getnchannels()
                                sw = w.getsampwidth()
                                fr = w.getframerate()
                                nf = w.getnframes()
                                raw = w.readframes(nf)
                            if sw == 2:
                                a = _np.frombuffer(raw, dtype="<i2").astype(
                                    _np.float64
                                )
                            elif sw == 1:  # WAV 8-bit is unsigned
                                a = (
                                    _np.frombuffer(raw, dtype=_np.uint8).astype(
                                        _np.float64
                                    )
                                    - 128.0
                                ) * 256.0
                            else:
                                raise ValueError(f"unsupported width {sw}")
                            if nch > 1 and a.size:
                                a = a.reshape(-1, nch).mean(axis=1)
                            dur = round(nf / fr, 6) if fr else None
                            lvl = round(
                                float(_np.abs(a).mean()) / 32768.0, 6
                            ) if a.size else 0.0
                            cross = (
                                int(
                                    (
                                        _np.signbit(a[1:]) != _np.signbit(a[:-1])
                                    ).sum()
                                )
                                if a.size > 1
                                else 0
                            )
                            zcr = round(cross / max(1, a.size - 1), 6)
                        except Exception:
                            dur = lvl = zcr = None  # corrupt header/frames
                    feats["duration_s_est"].append(dur)
                    feats["mean_level"].append(lvl)
                    feats["crossing_rate"].append(zcr)
                yield _pd.DataFrame(feats).astype({"n_bytes": "int64"})

        return audio.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)

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
