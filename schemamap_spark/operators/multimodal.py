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


def sample_frames(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling contract for video columns: one output row per sampled
    frame. Decoder absent in this container."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings; the contract is "
        "mapInPandas(payload) -> rows(video_id, frame_no, frame_bytes)"
    )
