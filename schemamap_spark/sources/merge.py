"""Upsert / optimistic-locking merge recipes.

The reference relies on Postgres `INSERT … ON CONFLICT DO UPDATE`
(rust/create_schemamap_schema.sql:126-137) and a row trigger enforcing
optimistic locking via a `version` counter that raises 'Optimistic update
failed' on mismatch (SCHEMA:22-45). Spark has no triggers; both become
explicit merge plans over immutable snapshots:

- target LEFT JOIN updates on the key
- matched + version-match  → apply update, version+1, fresh updated_at
- matched + version-mismatch → error (strict) or keep target row
- unmatched updates → inserted

Scale notes: a plain shuffled join on the merge key; with a sorted/bucketed
target this is where you'd bucket both sides by the key to make the merge
shuffle-free. No collect; the conflict check is a count() on the joined plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class OptimisticLockError(RuntimeError):
    pass


class DuplicateKeyError(ValueError):
    pass


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    version_col: str | None = None,
    strict: bool = True,
    updated_at_col: str | None = None,
) -> DataFrame:
    """Return the merged DataFrame (pure function; callers persist it).

    With `version_col`, an update only applies when update.version ==
    target.version; the new row carries version+1. `strict=True` raises
    OptimisticLockError if any matched update has a stale version —
    the reference trigger's 'Optimistic update failed'.
    """
    update_cols = update_cols or [c for c in updates.columns if c not in keys and c != version_col]

    u = updates.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in update_cols],
        *( [F.col(version_col).alias("__u_version")] if version_col else [] ),
        F.lit(True).alias("__matched"),
    )
    cond = [target[k] == u[f"__k_{k}"] for k in keys]
    joined = target.join(u, cond, "full_outer")

    # existence of a target row, independent of any nullable payload column
    # (join keys are non-null by contract)
    t_exists = target[keys[0]].isNotNull()

    if version_col and strict:
        stale = joined.filter(
            F.col("__matched").isNotNull()
            & t_exists
            & ~F.col("__u_version").eqNullSafe(target[version_col])
        ).count()
        if stale:
            raise OptimisticLockError(f"Optimistic update failed ({stale} stale rows)")

    # INSERTs (no target row) always apply, whatever their version value —
    # a NULL update-version must not silently discard the inserted payload.
    version_ok = (
        ~t_exists | F.col("__u_version").eqNullSafe(target[version_col])
        if version_col
        else F.lit(True)
    )
    apply_update = F.col("__matched").isNotNull() & version_ok

    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.coalesce(target[c], F.col(f"__k_{c}")).alias(c))
        elif version_col and c == version_col:
            out_cols.append(
                F.when(apply_update & t_exists, F.coalesce(target[c], F.lit(0)) + 1)
                .when(~t_exists, F.coalesce(F.col("__u_version"), F.lit(0)))
                .otherwise(target[c])
                .alias(c)
            )
        elif c == updated_at_col:
            out_cols.append(
                F.when(apply_update, F.current_timestamp()).otherwise(target[c]).alias(c)
            )
        elif c in update_cols:
            out_cols.append(
                F.when(apply_update, F.col(f"__u_{c}"))
                .otherwise(target[c])
                .alias(c)
            )
        else:
            out_cols.append(target[c].alias(c))
    return joined.select(*out_cols)


def scd2_merge(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_ts: str,
    tracked_cols: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    strict: bool = True,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply a snapshot of `updates`
    to a versioned dimension, KEEPING history (the warehouse twin of the
    reference's in-place ON CONFLICT upsert — same key semantics, but every
    change closes the old row instead of overwriting it).

    `target` rows carry (valid_from, valid_to NULL=open, is_current);
    `updates` carries the business columns only. Per key:
      - new key                  -> open row inserted (valid_from = effective_ts)
      - tracked columns changed  -> current row closed (valid_to = effective_ts,
                                    is_current = false) + new open row
      - unchanged                -> untouched (no churn rows)
    History rows pass through untouched. Pure function; callers persist.

    Change detection is null-safe equality over `tracked_cols` (default:
    every update column except the keys). `strict` raises DuplicateKeyError
    when the snapshot has several rows per key — silently merging them
    would make "the" new value order-dependent — and when the snapshot has
    NULL-keyed rows, which can never equi-join the dimension and would
    otherwise be re-inserted as fresh open rows on EVERY merge. Non-strict
    drops NULL-keyed updates (NULL-keyed TARGET rows always pass through
    untouched either way).

    Scale: one shuffled join of the CURRENT slice against the snapshot on
    the key (history never joins), plus a union — the same plan family as
    merge_upsert; bucket both sides on the key to elide the shuffle.
    """
    tracked_cols = tracked_cols or [c for c in updates.columns if c not in keys]
    meta = [valid_from, valid_to, current_flag]
    biz_cols = [c for c in target.columns if c not in meta]
    eff = F.lit(effective_ts).cast("timestamp")

    any_key_null = None
    for k in keys:
        n = F.col(k).isNull()
        any_key_null = n if any_key_null is None else (any_key_null | n)

    if strict:
        # one pass over the snapshot catches both ambiguity classes:
        # duplicated keys (which new value wins?) and NULL keys (can never
        # equi-join the dimension, so they'd re-insert a fresh open row on
        # EVERY merge — silent unbounded duplication)
        chk = (
            updates.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("dups"),
                F.sum(F.when(any_key_null, F.col("n")).otherwise(0)).alias("nulls"),
            )
            .first()
        )
        if chk["dups"]:
            raise DuplicateKeyError(f"updates carry {chk['dups']} duplicated key(s)")
        if chk["nulls"]:
            raise DuplicateKeyError(
                f"updates carry {chk['nulls']} NULL-keyed row(s): they can "
                "never match a dimension key, so each merge would insert "
                "them again as fresh open rows"
            )
    else:
        # non-strict: drop them instead of letting them accumulate
        updates = updates.filter(~any_key_null)

    history = target.filter(~F.col(current_flag))
    current = target.filter(F.col(current_flag))
    # NULL-key current rows can never match an update (NULL never equi-joins)
    # and would otherwise fall through every branch below (t_exists is false
    # for them) and vanish — pass them through untouched instead
    null_keyed = current.filter(any_key_null)
    current = current.filter(~any_key_null)

    u = updates.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.lit(True).alias("__has_update"),
    )
    cond = [current[k] == u[f"__k_{k}"] for k in keys]
    joined = current.join(u, cond, "full_outer")
    t_exists = current[keys[0]].isNotNull()
    # null-safe "all tracked columns equal" predicate
    same = None
    for c in tracked_cols:
        eq = current[c].eqNullSafe(F.col(f"__u_{c}"))
        same = eq if same is None else (same & eq)
    same = same if same is not None else F.lit(True)

    # unchanged current rows (matched & same) or current rows with no update
    keep = joined.filter(
        t_exists & (F.col("__has_update").isNull() | same)
    ).select(*[current[c].alias(c) for c in target.columns])

    # changed current rows close at the effective timestamp
    closed = joined.filter(
        t_exists & F.col("__has_update").isNotNull() & ~same
    ).select(
        *[
            current[c].alias(c) if c not in (valid_to, current_flag)
            else (eff.alias(valid_to) if c == valid_to else F.lit(False).alias(current_flag))
            for c in target.columns
        ]
    )

    # fresh open rows: brand-new keys and new versions of changed keys
    fresh = joined.filter(
        F.col("__has_update").isNotNull() & (~t_exists | ~same)
    ).select(
        *[
            (
                F.coalesce(current[c], F.col(f"__k_{c}")).alias(c)
                if c in keys
                else F.col(f"__u_{c}").alias(c)
                if c in tracked_cols
                else F.coalesce(current[c], F.lit(None).cast(target.schema[c].dataType)).alias(c)
            )
            for c in biz_cols
        ],
        eff.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(current_flag),
    ).select(*target.columns)

    return (
        history.unionByName(null_keyed)
        .unionByName(keep)
        .unionByName(closed)
        .unionByName(fresh)
    )


def scd2_init(
    df: DataFrame,
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Bootstrap an SCD2 dimension from a plain snapshot: every row open as
    of effective_ts."""
    return df.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(current_flag),
    )


def scd2_as_of(
    dim: DataFrame,
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Time-travel view of an SCD2 dimension: the version of every key that
    was current at `ts` (valid_from <= ts < valid_to, open rows unbounded).
    A pure filter — parquet min/max stats on valid_from/valid_to prune at
    scan time if the dimension is range-sorted on valid_from."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )
