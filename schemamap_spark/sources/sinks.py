"""Write paths: parquet warehouse sinks and the JDBC/Postgres sink.

The reference's data movement targets Postgres via unlogged staging tables +
server-side merge (rust/src/common.rs:12-13). The Spark equivalents:

- warehouse parquet: atomic directory-swap overwrite (same recipe as the SMO
  snapshot) so readers never see partial writes;
- JDBC append: partitioned parallel INSERT batches (numPartitions writers ×
  batchsize rows, `reWriteBatchedInserts=true` turns them into multi-row
  inserts server-side);
- staged JDBC merge: append into a staging table, then issue one server-side
  INSERT ... ON CONFLICT from staging — bulk ingest without row-by-row
  upserts through the wire. SQL assembly is pure (unit-testable without a
  live server); execution requires a JDBC driver + reachable Postgres.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame

_IDENT_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_.]*$")


def write_parquet_atomic(df: DataFrame, target_dir: str, ordered_by: list[str] | None = None) -> None:
    """Write to a temp dir then swap into place.

    Crash-safe w.r.t. leftovers: a stale '<target>.old' from a previously
    interrupted swap is removed first (os.rename onto a non-empty dir fails
    with ENOTEMPTY on POSIX, which would otherwise wedge every later write).
    The two renames are each atomic but the window between them is not: a
    concurrent reader can see a missing target for an instant, and a crash
    inside the window leaves the previous data in '<target>.old' for manual
    recovery. Single-writer semantics are assumed (the reference's matview
    refresh has the same contract)."""
    parent = os.path.dirname(os.path.abspath(target_dir))
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".write_new_")
    out = df.orderBy(*ordered_by) if ordered_by else df
    out.write.mode("overwrite").parquet(tmp)
    _swap_into_place(tmp, target_dir)


def _swap_into_place(tmp: str, target_dir: str) -> None:
    """Directory-swap tail shared by every warehouse writer (see the
    crash-safety contract in write_parquet_atomic's docstring)."""
    old = target_dir + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def write_range_sorted(
    df: DataFrame,
    target_dir: str,
    sort_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Range-partitioned, sorted-within-partition parquet write — the layout
    that makes 100 TB scans cheap: every output file covers a DISJOINT
    sort-key range (modulo the boundary value), so parquet min/max footer
    stats let a range predicate skip whole files and row groups instead of
    reading them. Pair with a filter on sort_cols[0]; .explain shows the
    pushed filter, and the footer test asserts the disjointness.

    repartitionByRange samples keys to pick balanced boundaries (no hot
    file); num_files defaults to spark.sql.shuffle.partitions."""
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    spark = df.sparkSession
    n = num_files or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    # same atomic temp-dir swap as write_parquet_atomic: readers never see a
    # half-written layout
    parent = os.path.dirname(os.path.abspath(target_dir))
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".write_new_")
    out.write.mode("overwrite").parquet(tmp)
    _swap_into_place(tmp, target_dir)


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    num_partitions: int = 8,
    batchsize: int = 10_000,
    properties: dict | None = None,
) -> None:
    """Parallel JDBC append. num_partitions bounds concurrent connections
    (the reference caps connections at 5/role — rust/create_schemamap_users
    .sql:11-17; size accordingly)."""
    (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("reWriteBatchedInserts", "true")
        .options(**(properties or {}))
        .mode("append")
        .save()
    )


def staged_merge_sql(
    staging_table: str,
    target_table: str,
    columns: list[str],
    keys: list[str],
    update_cols: list[str] | None = None,
) -> str:
    """Server-side upsert statement from a loaded staging table — the SQL the
    Postgres-backed sink issues after write_jdbc_append(staging). Identifiers
    are validated (the engine never templates unvalidated input, cf. the
    reference's quote_ident guards)."""
    for ident in [staging_table, target_table, *columns, *keys]:
        if not _IDENT_RE.match(ident):
            raise ValueError(f"invalid identifier: {ident!r}")
    update_cols = update_cols or [c for c in columns if c not in keys]
    col_list = ", ".join(columns)
    key_list = ", ".join(keys)
    sets = ", ".join(f"{c} = excluded.{c}" for c in update_cols)
    return (
        f"insert into {target_table} ({col_list})\n"
        f"select {col_list} from {staging_table}\n"
        f"on conflict ({key_list}) do update set {sets}"
    )
