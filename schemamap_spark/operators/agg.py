"""Skew- and size-safe set-aggregation machinery.

`collect_set` has two failure modes at 100 TB that the built-in can't guard:

1. HOT KEY — one key with millions of values sends them all to one reducer
   (and one agg buffer). `two_level_collect_set` splits the aggregation:
   partial sets per (key, salt) shard first, then a merge of <= salt
   already-deduped arrays per key. The second shuffle moves pre-shrunk
   arrays, so a key whose raw fan-in is 10M rows of 100 distinct values
   costs 16 x 100 array entries at merge time, not 10M rows in one task.

2. UNBOUNDED DOMAIN — when values per key are genuinely unbounded, ANY
   full collect explodes the buffer. `bounded_collect_set` pre-ranks values
   per (key, value) and keeps only the first `limit` BEFORE collecting, so
   both the shuffle and the agg buffer are capped at `limit` rows per key.
   The kept values are the `limit` smallest (deterministic, orderable
   types) — a truncation POLICY, stated in the column name, not a silent
   drop.

These discharge SCALE.md debts #1/#2: the SMO builder keeps its single-level
collect_set (catalog fan-in is per-column constraint counts — tiny by
construction) but the machinery exists for the pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_level_collect_set(
    df: DataFrame,
    keys: list[str],
    value: str,
    out: str = "values",
    salt: int = 16,
) -> DataFrame:
    """Per-key sorted distinct-value array, aggregated in two rounds so no
    single task sees a hot key's full raw fan-in.

    Output is identical to ``sort_array(collect_set(value))`` for any input
    (asserted in tests); use when the ROW count per key can be huge even if
    the DISTINCT count is modest.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    sharded = df.withColumn("_shard", F.pmod(F.xxhash64(F.col(value)), F.lit(salt)))
    partial = sharded.groupBy(*keys, "_shard").agg(
        F.collect_set(value).alias("_partial")
    )
    # shards were split BY VALUE, so shard sets are disjoint per key — flatten
    # is already distinct; sort canonicalizes task-order nondeterminism.
    return partial.groupBy(*keys).agg(
        F.sort_array(F.flatten(F.collect_list("_partial"))).alias(out)
    )


def bounded_collect_set(
    df: DataFrame,
    keys: list[str],
    value: str,
    limit: int,
    out: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Per-key sorted array of the `limit` smallest distinct values.

    Exact (each shard keeps its own `limit` smallest, and the global `limit`
    smallest are a subset of that union), with BOTH hazards bounded:
    - dedup shuffles on (key, value) — skew-safe regardless of hot keys;
    - the rank runs per (key, shard), so a hot key's distinct values sort in
      `salt` parallel spillable partitions, never one task;
    - the final merge ranks <= salt*limit rows per key, and the collect
      buffer never holds more than `limit` values.

    Default output column ``<value>_first<limit>`` keeps the truncation
    policy visible at the schema.
    """
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    out = out or f"{value}_first{limit}"
    # collect_set ignores nulls; drop them BEFORE ranking so a null can't
    # consume a rank slot and silently shrink the result below `limit`
    distinct = (
        df.filter(F.col(value).isNotNull())
        .groupBy(*keys, value)
        .agg(F.lit(1))
        .select(*keys, value)
    )
    sharded = distinct.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(value)), F.lit(salt))
    )
    w_shard = Window.partitionBy(*keys, "_shard").orderBy(F.col(value))
    survivors = (
        sharded.withColumn("_rk", F.row_number().over(w_shard))
        .filter(F.col("_rk") <= limit)
        .drop("_rk", "_shard")
    )
    w_key = Window.partitionBy(*keys).orderBy(F.col(value))
    final = survivors.withColumn("_rk", F.row_number().over(w_key)).filter(
        F.col("_rk") <= limit
    )
    return final.groupBy(*keys).agg(F.sort_array(F.collect_list(value)).alias(out))
