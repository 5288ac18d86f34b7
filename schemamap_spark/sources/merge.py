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
