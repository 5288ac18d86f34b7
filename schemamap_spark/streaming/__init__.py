from schemamap_spark.streaming.pipeline import (
    stream_events_from_directory,
    windowed_counts,
    sessionized,
    continuous_hourly_rollup,
    interval_join_streams,
    dsir_gate_stream,
    mixture_fill_stream,
    enrich_stream,
    curated_document_stream,
    ann_ingest_stream,
    daily_from_hourly,
    start_memory_sink,
)

__all__ = [
    "stream_events_from_directory",
    "windowed_counts",
    "sessionized",
    "continuous_hourly_rollup",
    "interval_join_streams",
    "dsir_gate_stream",
    "mixture_fill_stream",
    "enrich_stream",
    "curated_document_stream",
    "ann_ingest_stream",
    "daily_from_hourly",
    "start_memory_sink",
]
