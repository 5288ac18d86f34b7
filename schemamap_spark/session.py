"""SparkSession construction and shared I/O helpers.

Everything in the engine goes through `get_spark()` / `load_table()` so that
session-level settings that affect correctness (UTC session timezone for
naive-parquet timestamps) and scale (AQE, shuffle partitions) are applied
uniformly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables provided by the driver test data (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "schemamap-spark",
    shuffle_partitions: int | None = None,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession. `extra_configs` lets deployments
    inject site config — e.g. `{"spark.jars.packages":
    "org.postgresql:postgresql:42.7.4"}` to enable the JDBC catalog adapter's
    wire transport (no driver jar or network in this container; see
    COVERAGE.md 'Declared out of scope')."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / mapInPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_configs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply correctness-critical runtime conf to an externally-built session.

    The driver hands us its own SparkSession; parquet timestamps in the test
    data are timezone-naive, and Spark interprets them in the *session*
    timezone. Pinning UTC makes wall-clock values (and any date bucketing)
    engine-independent and DST-free.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the driver's events.parquet carries TIMESTAMP(NANOS) which Spark rejects
    # unless read as long; load_table converts back to timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def ensure_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Spread a narrow (few-file) input across the cluster before CPU-heavy
    work. No-op when the scan is already wide; at scale the input has many
    splits and this never fires.

    Width is judged from the scan's file list (metadata only) — not
    df.rdd.getNumPartitions(), which forces an RDD conversion/analysis on
    every call. Plans with no identifiable input files (already shuffled /
    in-memory) are left alone: they carry spark.sql.shuffle.partitions."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < parallelism:
        return df.repartition(parallelism, key) if key else df.repartition(parallelism)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fresh: bool = False
) -> DataFrame:
    """Read one test-data table, with the resolved PLAN cached per
    (session, dir, table) — the catalog-metadata caching every SQL engine
    performs (Spark's own `spark.table()` resolves a relation once; the
    reference's Postgres caches its catalogs). Each fresh `read.parquet`
    costs ~60 ms of driver wall (file listing + footer schema) — ~100
    such calls per bench run re-derived identical metadata for immutable
    input dirs. Actions on the returned frame still scan the parquet
    files every execution; only the relation (listing + schema + the ts
    restoration below) is reused. `fresh=True` bypasses and refreshes
    the entry — required if the directory's files were REPLACED
    mid-session (the cached relation snapshots the file listing, exactly
    as a temp view would)."""
    configure_session(spark)
    cache = getattr(spark, "_schemamap_table_plans", None)
    if cache is None:
        cache = {}
        spark._schemamap_table_plans = cache
    key = (os.path.abspath(sf_dir), name)
    if not fresh:
        hit = cache.get(key)
        if hit is not None:
            return hit
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # nanosAsLong surfaces nanosecond timestamp columns as bigint; restore a
    # proper timestamp (microsecond floor — Spark's native resolution).
    from pyspark.sql import types as T
    from pyspark.sql import functions as F

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division, NOT (ts/1000).cast("long"): modern epoch-ns values
        # (~1.7e18) exceed double's 2^53 exact range, so double division can be
        # off by ±1 µs before flooring — a landmine for boundary-sensitive
        # windows. `div` stays in bigint arithmetic end to end.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test-data table as a temp view for spark.sql paths."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
