"""Event-stream operator queries (batch-checkable renditions).

The same windowing logic runs as a real Structured Streaming pipeline in
schemamap_spark/streaming/pipeline.py (watermarks + windows, tested with a
file stream); here it's executed on the bounded events table so DuckDB can
oracle it. Session timezone is pinned UTC (session.load_table), so epoch
arithmetic agrees across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.session import load_table


def events_tumbling_window(spark, sf):
    """Hourly tumbling windows with engine-portable money arithmetic.

    `value` is a raw double; summing it through per-row decimal(18,2) casts is
    NOT portable (Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds
    the binary value — different cents on repr-ends-in-5 inputs). Instead we
    sum integer cents: floor(value*100) of the same IEEE double is bit-identical
    in every engine, and bigint addition is exact."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("total_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_cents",
        )
        .orderBy("window_start", "event_type")
    )


def events_sessionize(spark, sf):
    """30-minute-gap session windows per user (the streaming session-window
    operator, run on bounded input)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def events_top_users_daily(spark, sf):
    """Daily per-user activity ranking — window function over event-time
    buckets (top 3 users per day by event count)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("day").orderBy(F.desc("n"), "user_id")
    return (
        daily.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("day", "user_id", "n", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("day", "rnk")
    )


def events_asof_join(spark, sf):
    """As-of join: each purchase matched to the user's most recent prior (or
    simultaneous) view — an operator Spark lacks natively, implemented with
    the union + running-last-value window (operators/temporal.py); DuckDB's
    native ASOF JOIN is the oracle."""
    from schemamap_spark.operators.temporal import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    joined = asof_join(purchases, views, key="user_id", ts="ts", right_cols=["view_event_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("purchase_epoch"),
        F.col("view_event_id_right").alias("view_event_id"),
        F.unix_timestamp("ts_right").alias("view_epoch"),
    ).orderBy("event_id")


def events_range_join(spark, sf):
    """Range join: events counted into per-user daily 00:00-06:00 windows via
    bucketed interval join (operators/temporal.py)."""
    from schemamap_spark.operators.temporal import range_join

    ev = load_table(spark, sf, "events")
    intervals = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("start_ts"))
        .distinct()
        .withColumn("end_ts", F.col("start_ts") + F.expr("interval 6 hours"))
    )
    joined = range_join(ev, intervals, key="user_id")
    return (
        joined.groupBy("user_id", F.unix_timestamp("start_ts").alias("window_epoch"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("user_id", "window_epoch")
    )


def events_rollup_cascade(spark, sf):
    """Hypertable-style continuous-aggregate cascade: daily totals computed
    FROM the hourly aggregate (never re-scanning raw events). The oracle
    aggregates raw → daily directly; equality proves the cascade is lossless
    — the pre-aggregation pattern that turns 100 TB of raw events into MB of
    reusable rollups. Integer-cents sums (floor(value*100) as bigint) make
    re-aggregation exact AND engine-portable; see events_tumbling_window."""
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("v"),
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", F.col("w.start")).alias("day"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("v").alias("total_cents"))
        .select(
            F.unix_timestamp("day").alias("day_epoch"),
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("total_cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("day_epoch", "event_type")
    )
    return daily


SPARK_QUERIES = {
    "events_tumbling_window": events_tumbling_window,
    "events_rollup_cascade": events_rollup_cascade,
    "events_sessionize": events_sessionize,
    "events_top_users_daily": events_top_users_daily,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
}

ORACLE_SQL = {
    "events_tumbling_window": """
        select cast(epoch(time_bucket(interval '1 hour', ts)) as bigint) as window_start,
               event_type,
               count(*) as n,
               -- integer cents: floor() of the same IEEE double is identical in
               -- every engine, unlike double->decimal(18,2) rounding. Outer cast
               -- is required: DuckDB sum(BIGINT) is HUGEINT, which turns into
               -- float64 through the driver's pandas fetch (hash mismatch).
               cast(sum(cast(floor(value * 100) as bigint)) as bigint) as total_cents
        from events
        group by 1, 2 order by 1, 2
    """,
    "events_sessionize": """
        with ordered as (
          select user_id, ts,
                 lag(ts) over (partition by user_id order by ts) as prev_ts
          from events
        ),
        marked as (
          select user_id, ts,
                 case when prev_ts is null or ts - prev_ts > interval '30 minutes'
                      then 1 else 0 end as new_session
          from ordered
        ),
        sessions as (
          select user_id, ts,
                 sum(new_session) over (partition by user_id order by ts
                                        rows unbounded preceding) as session_id
          from marked
        )
        select user_id,
               -- floor, not cast: DuckDB's double->bigint cast rounds, Spark's
               -- unix_timestamp floors to the second
               cast(floor(epoch(min(ts))) as bigint) as session_start,
               count(*) as n_events
        from sessions
        group by user_id, session_id
        order by user_id, session_start
    """,
    "events_rollup_cascade": """
        select cast(floor(epoch(date_trunc('day', ts))) as bigint) as day_epoch,
               event_type,
               count(*) as n,
               -- outer cast: DuckDB sum(BIGINT) -> HUGEINT -> float64 via pandas
               cast(sum(cast(floor(value * 100) as bigint)) as bigint) as total_cents
        from events
        group by 1, 2 order by 1, 2
    """,
    "events_asof_join": """
        with purchases as (
          select event_id, user_id, ts from events where event_type = 'purchase'
        ),
        views as (
          select event_id as view_event_id, user_id, ts from events where event_type = 'view'
        )
        select p.event_id, p.user_id,
               cast(floor(epoch(p.ts)) as bigint) as purchase_epoch,
               v.view_event_id,
               cast(floor(epoch(v.ts)) as bigint) as view_epoch
        from purchases p
        asof left join views v
          on p.user_id = v.user_id and v.ts <= p.ts
        order by p.event_id
    """,
    "events_range_join": """
        with intervals as (
          select distinct user_id, date_trunc('day', ts) as start_ts,
                 date_trunc('day', ts) + interval 6 hours as end_ts
          from events
        )
        select e.user_id,
               cast(floor(epoch(i.start_ts)) as bigint) as window_epoch,
               count(*) as n
        from events e
        join intervals i
          on e.user_id = i.user_id and e.ts >= i.start_ts and e.ts < i.end_ts
        group by 1, 2 order by 1, 2
    """,
    "events_top_users_daily": """
        with daily as (
          select strftime(ts, '%Y-%m-%d') as day, user_id, count(*) as n
          from events group by 1, 2
        ),
        ranked as (
          select day, user_id, n,
                 row_number() over (partition by day order by n desc, user_id) as rnk
          from daily
        )
        select day, user_id, n, cast(rnk as int) as rnk
        from ranked where rnk <= 3 order by day, rnk
    """,
}
