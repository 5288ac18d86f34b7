"""Skew-handling join helpers for the 100 TB regime.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these helpers cover
the cases AQE can't:

- salted_join: explicit salting for a *known* pathological key distribution
  (e.g. one tenant owning 40% of rows) — replicates the small side R ways and
  scatters the big side's hot keys across R partitions.
- bucketed co-located join: write both sides bucketed by the join key once,
  then every subsequent join on that key is shuffle-free (SortMergeJoin with
  no Exchange).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join robust to heavy skew in `big`'s join-key distribution.

    big gains a random salt in [0, salt_buckets); small is replicated once
    per salt value (an explode of a literal range — cheap for dim-sized
    inputs). The join key becomes (key, salt), spreading each hot key over
    salt_buckets partitions. Semantically identical to big.join(small, on)
    for inner/left/left_semi; right/full would emit one null-padded row PER
    REPLICA of an unmatched small row, so they are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table: joins and
    aggregations on bucket_col then run WITHOUT a shuffle."""
    spark = df.sparkSession
    # idempotent across sessions: a stale location without a metastore entry
    # (fresh derby metastore, surviving warehouse dir) blocks saveAsTable
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — verify with
    .explain(): no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def key_skew_report(
    df: DataFrame,
    key: str,
    top: int = 10,
) -> DataFrame:
    """Pre-join diagnostic: the top-k hottest join keys with their share of
    the table and the skew factor (hot-key count / mean per-key count).
    Read it BEFORE a big join: skew_factor >> 10 on a shuffled join means
    AQE's runtime splitting may not be enough — reach for salted_join, and
    size salt_buckets ~ skew_factor of the hottest key.

    One aggregation on the key + a 1-row broadcast of the global stats;
    top-k via TakeOrderedAndProject. NULL keys count too (they hash to one
    partition like any other value — the classic accidental hot key)."""
    per_key = df.groupBy(F.col(key)).agg(F.count(F.lit(1)).alias("n"))
    totals = per_key.agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            key,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("__nkeys") / F.col("__total"), 2
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), key)
        .limit(top)
    )
