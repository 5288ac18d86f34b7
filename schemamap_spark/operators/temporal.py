"""Temporal join operators Spark lacks natively: as-of join and range join.

- asof_join: for each left row, the single most recent right row with
  right.ts <= left.ts per key. Implemented with the union + running
  last_value window trick: ONE sort-within-partition over (key, ts), no
  per-row subqueries, no BroadcastNestedLoop. Scales as a single shuffle on
  the key with in-partition ordering — the plan you want at 100 TB.
- range_join: rows joined to intervals containing them. Naive theta joins
  become BNLJ; bucketing both sides by coarse time buckets turns it into an
  equi-join on (key, bucket) with a residual predicate — intervals explode
  into the buckets they overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join (right.ts <= left.ts, latest wins; ties on equal ts
    take the right row — matching DuckDB/kdb ASOF semantics).

    Output: all left columns + right_cols renamed with `suffix`
    (+ f"{ts}{suffix}" for the matched right timestamp).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]

    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("__is_left"),
        F.struct(*[c for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts).alias("__r_ts"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal ts (__is_left asc) so a
    # same-timestamp right row is visible to the left row — ASOF <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__f_ts"),
    )
    out = filled.filter(F.col("__is_left") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("__f_ts").alias(f"{ts}{suffix}"),
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with start <= point < end, same key.

    Both sides gain a coarse time-bucket column (intervals explode into every
    bucket they overlap), the join runs as an equi-join on (key, bucket), and
    the exact range predicate filters residually. Bucket width trades
    replication (long intervals) against candidate fan-in.

    Supported `how`: inner, left. A residual filter after an outer join would
    silently drop unmatched rows (the predicate is NULL on null-padded rows),
    so left is implemented as inner + anti-join add-back; right/full are
    rejected rather than silently wrong."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    p = points.withColumn(
        "__bucket", (F.unix_timestamp(point_ts) / bucket_seconds).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / bucket_seconds).cast("long"),
                (F.unix_timestamp(end_col) / bucket_seconds).cast("long"),
            )
        ),
    )
    interval_cols = [c for c in intervals.columns if c != key]
    pp, ii = p.alias("p"), i.alias("i")
    inner = (
        pp.join(
            ii,
            (F.col(f"p.{key}") == F.col(f"i.{key}"))
            & (F.col("p.__bucket") == F.col("i.__bucket"))
            & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_col}"))
            & (F.col(f"p.{point_ts}") < F.col(f"i.{end_col}")),
            "inner",
        )
        .select(*[F.col(f"p.{c}") for c in points.columns],
                *[F.col(f"i.{c}") for c in interval_cols])
    )
    if how == "inner":
        return inner
    unmatched = points.join(
        inner.select(*points.columns).distinct(), points.columns, "left_anti"
    ).select(
        "*",
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in interval_cols],
    )
    return inner.unionByName(unmatched)
