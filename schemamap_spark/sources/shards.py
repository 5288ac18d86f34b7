"""Training-shard export: the LAST stage of a training-data pipeline —
deterministically shuffle a curated corpus into N balanced, reproducible
shards and write them atomically, with a per-shard manifest the training
loader schedules from.

Why a dedicated writer: training jobs need (a) a FIXED shard count that
matches the loader's data-parallel layout, (b) byte-reproducible content
per shard (same corpus + same salt → same shards, forever, on any cluster
size or partitioning — resumable runs and A/B trains depend on it), and
(c) a deterministic WITHIN-shard order that breaks source/crawl clustering
(consecutive docs from one domain degrade training; a reproducible
pseudo-random order fixes it without a nondeterministic global shuffle).
`df.repartition(N).write` gives none of the three: round-robin assignment
depends on input partitioning, and file order inside a task is whatever
the scan produced.

Scale shape — ONE shuffle, no global sort: shard assignment is the Knuth
multiplicative hash of the stable id (same overflow-free arithmetic as
operators/sampling.py, portable enough that the DuckDB extras oracle
recomputes assignments exactly), `repartition(num_shards, shard)` moves
each row once, and the training order is a sortWithinPartitions — a
per-task spillable sort, never an all-to-all range exchange. Shard sizes
are multinomial around corpus/N (hash-uniform; the balance is pinned in
tests). Only the row itself rides the shuffle, exactly once, which is the
floor for any exporter that co-locates a shard's rows.

The reference engine has no training exporter; this belongs to the
training-pipeline layer the engine adds on top (SURVEY.md §6).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schemamap_spark.operators.sampling import knuth_hash
from schemamap_spark.sources import fscommit
from schemamap_spark.sources.sinks import _stage, _swap_into_place

_MANIFEST = "_SHARDS.json"
_MAX_SHARDS = 1_000_000  # repartition bookkeeping is O(num_shards) on the
# driver; past this you are misusing shards as rows


def assign_shards(
    df: DataFrame, num_shards: int, id_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Add a `shard` column in [0, num_shards): stable forever for a given
    (id, salt) — re-running, re-partitioning, or growing the corpus never
    moves an existing row to a different shard. `salt` gives independent
    assignments for different exports (epoch re-shuffles, eval re-splits)
    from the same ids."""
    if not 1 <= num_shards <= _MAX_SHARDS:
        raise ValueError(
            f"num_shards must be in [1, {_MAX_SHARDS}], got {num_shards}"
        )
    if id_col not in df.columns:
        raise ValueError(f"id_col {id_col!r} is not a column of df")
    if "shard" in df.columns:
        raise ValueError(
            "df already has a 'shard' column (re-sharding a previously "
            "exported tree?) — drop or rename it first; silently "
            "overwriting it would lose data"
        )
    return df.withColumn(
        "shard", F.pmod(knuth_hash(id_col, salt), F.lit(num_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    target_dir: str,
    num_shards: int,
    id_col: str = "doc_id",
    salt: int = 0,
    token_col: str | None = None,
    shuffle: bool = True,
) -> None:
    """Export `df` as `target_dir/shard=K/` parquet (one file per shard —
    each shard's rows land wholly in one task) plus a `_SHARDS.json`
    manifest (per-shard row/token counts, the salt, and the shard count).

    Determinism contract: shard membership is the Knuth hash of
    (id, salt); within-shard order is the hash at salt+1 (ties by id) —
    a reproducible pseudo-random order that interleaves sources instead
    of preserving crawl/scan clustering. `shuffle=False` keeps the scan
    order within each task instead (cheaper by one sort; order then
    depends on the input layout and is NOT reproducible).

    Crash contract: the parquet tree is staged and swapped into place
    atomically (sinks._swap_into_place — the warehouse writers'
    contract); the manifest is written AFTER the swap as a convenience
    cache, so a crash between the two leaves valid data with no
    manifest, and `shard_stats` recomputes from the data in that case.
    Empty shards (possible when num_shards approaches the corpus size)
    have no directory on disk but DO appear in the manifest with zero
    rows — loaders should schedule from the manifest, not from listdir."""
    spark = df.sparkSession
    if token_col is not None and token_col not in df.columns:
        raise ValueError(f"token_col {token_col!r} is not a column of df")
    if "__ord" in df.columns:
        raise ValueError("'__ord' is reserved by the exporter — rename it")
    sharded = assign_shards(df, num_shards, id_col, salt)
    if df.isEmpty():
        # an empty export would swap an UNREADABLE tree (only _SUCCESS)
        # over a previous valid one and then fail computing stats — fail
        # fast before any I/O instead (checked after the cheap validations
        # above; isEmpty is a limit-1 job)
        raise ValueError(
            "refusing to export an empty DataFrame — it would replace any "
            "existing export with an unreadable tree (upstream curation "
            "probably filtered everything out)"
        )
    out = sharded.repartition(num_shards, "shard")
    if shuffle:
        out = (
            out.withColumn("__ord", knuth_hash(id_col, salt + 1))
            .sortWithinPartitions("shard", "__ord", id_col)
            .drop("__ord")
        )
    fs, tmp = _stage(target_dir, spark)
    out.write.partitionBy("shard").mode("overwrite").parquet(tmp)
    _swap_into_place(tmp, target_dir, fs)
    written = spark.read.parquet(target_dir)
    stats = _compute_stats(written, num_shards, token_col)
    # manifest publish is atomic (tmp + replace_file) so a reader or a
    # crash mid-write can never observe a TORN manifest — only the
    # documented missing-manifest window, which shard_stats self-heals
    mtmp = fscommit.join(target_dir, "._SHARDS_" + str(salt) + ".tmp")
    fs.write_text(
        mtmp,
        json.dumps(
            {
                "num_shards": num_shards,
                "salt": salt,
                "id_col": id_col,
                "token_col": token_col,
                "shards": stats,
            }
        ),
    )
    fs.replace_file(mtmp, fscommit.join(target_dir, _MANIFEST))


def _compute_stats(
    written: DataFrame,
    num_shards: int,
    token_col: str | None,
) -> list[dict]:
    """Per-shard row (and optional token) counts from the WRITTEN data —
    `shard` is the partition column, so the count scans prune to zero data
    columns (footer arithmetic); the token sum scans exactly one column.
    Missing shard dirs (empty shards) are filled with zero rows via an
    outer join against range(num_shards) — bounded driver collect of
    exactly num_shards rows."""
    spark = written.sparkSession
    aggs = [F.count(F.lit(1)).alias("rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("tokens"))
    per = written.groupBy("shard").agg(*aggs)
    full = (
        spark.range(num_shards)
        .select(F.col("id").cast("int").alias("shard"))
        .join(per, "shard", "left")
        .fillna(0)
        .orderBy("shard")
    )
    return [r.asDict() for r in full.collect()]


def shard_stats(spark: SparkSession, target_dir: str) -> DataFrame:
    """The export's per-shard manifest as a DataFrame. Reads
    `_SHARDS.json` when present and parseable; recomputes from the parquet
    tree when the manifest is missing (the documented crash window between
    data swap and manifest publish) OR unparseable (a pre-atomic-publish
    torn write; the publish is atomic now, but self-healing beats raising
    on stores written by older code) — in the recompute case num_shards is
    taken as max(shard)+1, which cannot see trailing empty shards;
    re-export to restore them."""
    fs = fscommit.fs_for(target_dir, spark)
    path = fscommit.join(target_dir, _MANIFEST)
    if fs.exists(path):
        try:
            m = json.loads(fs.read_text(path))
        except ValueError:
            m = None  # torn legacy manifest — fall through to recompute
        if m is not None:
            rows = [
                (int(s["shard"]), int(s["rows"]), int(s.get("tokens", 0)))
                for s in m["shards"]
            ]
            return spark.createDataFrame(
                rows, "shard int, rows long, tokens long"
            ).orderBy("shard")
    written = spark.read.parquet(target_dir)
    n = int(written.agg(F.max("shard")).first()[0]) + 1
    return spark.createDataFrame(
        [
            (int(s["shard"]), int(s["rows"]), 0)
            for s in _compute_stats(written, n, None)
        ],
        "shard int, rows long, tokens long",
    ).orderBy("shard")
