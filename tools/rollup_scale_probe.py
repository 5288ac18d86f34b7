"""Streaming rollup-store throughput — the seventh scale probe: the
continuous-aggregate twin of the ingest-gate probe. How fast does
continuous_hourly_rollup digest events into the append-only hourly store,
and does exactly-once hold across a RESTART at probe scale?

Shape: N events over 14 days × E event types, staged as TIME-ORDERED
slices (FileStreamSource processes files in modification-time order, and
the 2h watermark drops data arriving behind it — a random file split
would silently discard half the probe as late; ordering slices by event
time is exactly what a production ingest layout does). availableNow with
4-file triggers → several real micro-batches. Two phases share one
checkpoint:

  phase 1: first 7 days of slices          → query runs to termination
  phase 2: last 7 days + sentinel appended → NEW query, same checkpoint
           (the restart: must pick up only the new files, and the store
           must contain every finalized window exactly once)

Sentinel: one far-future event pushes the final watermark past every real
window so the bounded probe can verify the COMPLETE window set against
the batch aggregate (the test-suite convention).

Verification: daily_from_hourly(store) == batch daily aggregate over the
raw events (sentinel excluded), and no (window_start, event_type)
appears twice in the store. Also reports the payoff ratio: daily report
from the rollup store vs re-scanning raw events.

Run:  python tools/rollup_scale_probe.py [N]     (default 2,000,000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
TYPES, DAYS, SLICES, FILES_PER_SLICE = 20, 14, 8, 2


def main() -> None:
    from pyspark.sql import functions as F

    from schemamap_spark.session import get_spark
    from schemamap_spark.streaming.pipeline import (
        continuous_hourly_rollup,
        daily_from_hourly,
        stream_events_from_directory,
    )

    spark = get_spark("rollup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/rollup_scale_probe"
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    rollup, ckpt = os.path.join(base, "store"), os.path.join(base, "ckpt")

    # N events hash-uniform over 14 days; value in [0, 100)
    span_s = DAYS * 24 * 3600
    slice_s = span_s // SLICES
    ev = spark.range(N).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(span_s)).alias("sec"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)).alias("user_id"),
        F.concat(
            F.lit("type_"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(TYPES)).cast("string"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)) / 100.0).alias("value"),
        F.lit("{}").alias("props"),
    ).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_dt_interval(secs=F.col("sec")),
    )

    def stage(i: int) -> None:
        (
            ev.filter(
                (F.col("sec") >= i * slice_s) & (F.col("sec") < (i + 1) * slice_s)
            )
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
            .coalesce(FILES_PER_SLICE)
            .write.mode("append")
            .parquet(src)
        )

    for i in range(SLICES // 2):
        stage(i)

    t0 = time.monotonic()
    q = continuous_hourly_rollup(stream_events_from_directory(spark, src), rollup, ckpt)
    q.awaitTermination()
    t_phase1 = time.monotonic() - t0

    # phase 2: the remaining slices + the watermark-closing sentinel, then
    # a RESTART over the same checkpoint
    for i in range(SLICES // 2, SLICES):
        stage(i)
    spark.createDataFrame(
        [(10**12, "2025-01-01 00:00:00", 0, "__sentinel__", 0.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
        "event_type", "value", "props",
    ).write.mode("append").parquet(src)

    t0 = time.monotonic()
    q = continuous_hourly_rollup(stream_events_from_directory(spark, src), rollup, ckpt)
    q.awaitTermination()
    t_phase2 = time.monotonic() - t0

    store = spark.read.parquet(rollup)
    n_windows = store.count()
    dups = (
        store.groupBy("window_start", "event_type")
        .count().filter(F.col("count") > 1).count()
    )

    t0 = time.monotonic()
    got = {
        (r.day, r.event_type): (r.n, r.total_cents)
        for r in daily_from_hourly(spark, rollup).collect()
        if r.event_type != "__sentinel__"
    }
    t_daily_store = time.monotonic() - t0
    t0 = time.monotonic()
    want = {
        (r.day, r.event_type): (r.n, r.total_cents)
        for r in (
            spark.read.parquet(src)
            .filter(F.col("event_type") != "__sentinel__")
            .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.floor(F.col("value") * 100).cast("bigint"))
                .cast("bigint").alias("total_cents"),
            )
            .collect()
        )
    }
    t_daily_raw = time.monotonic() - t0

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(d) for f in fs
        )

    store_bytes, raw_bytes = dir_bytes(rollup), dir_bytes(src)
    wall = t_phase1 + t_phase2
    print("\n=== streaming rollup-store probe ===")
    print(f"{N:,} events, {DAYS} days x {TYPES} types, "
          f"{SLICES} time slices x {FILES_PER_SLICE} files, 4-file triggers, "
          f"watermark 2h")
    print(f"phase 1 (first half):             {t_phase1:.1f}s")
    print(f"phase 2 (restart, rest+sentinel): {t_phase2:.1f}s")
    print(f"total streaming wall: {wall:.1f}s  "
          f"({N / wall / 1000:.0f}k events/s into the rollup store)")
    print(f"store: {n_windows:,} window rows, duplicate windows: {dups}")
    print(f"cascade check: daily_from_hourly == batch daily over raw: "
          f"{got == want} ({len(got)} day-type cells)")
    print(f"daily report: {t_daily_store:.2f}s from store vs "
          f"{t_daily_raw:.2f}s from raw ({t_daily_raw / t_daily_store:.1f}x)")
    print(f"store bytes: {store_bytes / 1e6:.1f} MB vs raw {raw_bytes / 1e6:.1f} MB "
          f"({raw_bytes / store_bytes:.0f}x reduction)")
    if dups or got != want:
        raise SystemExit("PROBE FAILED: duplicates or cascade mismatch")


if __name__ == "__main__":
    main()
