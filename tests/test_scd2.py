"""SCD2 merge: history preservation, change detection, chained batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schemamap_spark.sources.merge import DuplicateKeyError, scd2_init, scd2_merge

T0, T1, T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", 200.0), (3, "carol", 300.0)],
        "id long, name string, balance double",
    )
    return scd2_init(snap, T0)


def test_scd2_merge_new_changed_unchanged(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [(1, "alice", 150.0),   # changed balance
         (2, "bob", 200.0),     # unchanged
         (4, "dan", 400.0)],    # brand-new key
        "id long, name string, balance double",
    )
    out = scd2_merge(dim, updates, ["id"], T1)
    rows = {(r.id, r.balance, str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None, r.is_current)
            for r in out.collect()}
    assert rows == {
        (1, 100.0, "2024-01-01", "2024-02-01", False),  # closed old version
        (1, 150.0, "2024-02-01", None, True),           # new version
        (2, 200.0, "2024-01-01", None, True),           # untouched (no churn)
        (3, 300.0, "2024-01-01", None, True),           # absent from snapshot: stays open
        (4, 400.0, "2024-02-01", None, True),           # insert
    }


def test_scd2_chained_batches_keep_contiguous_history(spark):
    dim = _dim(spark)
    b1 = spark.createDataFrame([(1, "alice", 150.0)], "id long, name string, balance double")
    b2 = spark.createDataFrame([(1, "alice", 175.0)], "id long, name string, balance double")
    out = scd2_merge(scd2_merge(dim, b1, ["id"], T1), b2, ["id"], T2)
    hist = sorted(
        [(str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None, r.balance, r.is_current)
         for r in out.filter(F.col("id") == 1).collect()]
    )
    assert hist == [
        ("2024-01-01", "2024-02-01", 100.0, False),
        ("2024-02-01", "2024-03-01", 150.0, False),
        ("2024-03-01", None, 175.0, True),
    ]
    # invariant: exactly one current row per key
    cur = out.filter("is_current").groupBy("id").count().filter("count > 1").count()
    assert cur == 0


def test_scd2_untracked_column_carries_over(spark):
    snap = spark.createDataFrame(
        [(1, "alice", 100.0, "seg-a")], "id long, name string, balance double, segment string"
    )
    dim = scd2_init(snap, T0)
    updates = spark.createDataFrame([(1, 150.0)], "id long, balance double")
    out = scd2_merge(dim, updates, ["id"], T1)
    new = out.filter("is_current").collect()[0]
    assert new.balance == 150.0
    assert new.segment == "seg-a"  # untracked col survives the version bump
    assert new.name == "alice"


def test_scd2_null_safe_change_detection(spark):
    snap = spark.createDataFrame([(1, None)], "id long, name string")
    dim = scd2_init(snap, T0)
    same = spark.createDataFrame([(1, None)], "id long, name string")
    out = scd2_merge(dim, same, ["id"], T1)
    assert out.count() == 1  # NULL == NULL under eqNullSafe: no new version


def test_scd2_duplicate_snapshot_keys_raise(spark):
    dim = _dim(spark)
    dup = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "id long, name string, balance double"
    )
    with pytest.raises(DuplicateKeyError):
        scd2_merge(dim, dup, ["id"], T1)


def test_scd2_as_of_time_travel(spark):
    from schemamap_spark.sources.merge import scd2_as_of

    dim = _dim(spark)
    b1 = spark.createDataFrame([(1, "alice", 150.0)], "id long, name string, balance double")
    out = scd2_merge(dim, b1, ["id"], T1)
    # before the change: the original version; after: the new one
    before = {r.id: r.balance for r in scd2_as_of(out, "2024-01-15 00:00:00").collect()}
    after = {r.id: r.balance for r in scd2_as_of(out, "2024-02-15 00:00:00").collect()}
    assert before[1] == 100.0 and after[1] == 150.0
    assert before[2] == after[2] == 200.0
    # exactly at the boundary, the NEW version is current (valid_to exclusive)
    at = {r.id: r.balance for r in scd2_as_of(out, T1).collect()}
    assert at[1] == 150.0
    # before the dimension existed: nothing
    assert scd2_as_of(out, "2019-01-01 00:00:00").count() == 0


def test_scd2_null_keyed_updates_strict_raise(spark):
    # a NULL-keyed update can never equi-join the dimension, so it would be
    # re-inserted as a fresh open row on EVERY merge — strict refuses it
    dim = _dim(spark)
    upd = spark.createDataFrame(
        [(None, "ghost", 9.0), (1, "alice", 150.0)],
        "id long, name string, balance double",
    )
    with pytest.raises(DuplicateKeyError, match="NULL-keyed"):
        scd2_merge(dim, upd, ["id"], T1)


def test_scd2_null_keyed_updates_nonstrict_dropped_not_accumulated(spark):
    dim = _dim(spark)
    upd = spark.createDataFrame(
        [(None, "ghost", 9.0), (1, "alice", 150.0)],
        "id long, name string, balance double",
    )
    out1 = scd2_merge(dim, upd, ["id"], T1, strict=False)
    out2 = scd2_merge(out1, upd, ["id"], T2, strict=False)
    # the NULL-keyed update is dropped, not inserted once per merge
    assert out1.filter(F.col("id").isNull()).count() == 0
    assert out2.filter(F.col("id").isNull()).count() == 0
    # and the real update applied exactly once (merge 2 sees it unchanged)
    assert out2.filter("is_current and id = 1").collect()[0].balance == 150.0
    # closed alice + new alice + bob + carol, stable across merges
    assert out2.count() == out1.count() == 4


def test_scd2_bucketed_dimension_merges_shuffle_free(spark):
    """The docstring's 'bucket both sides on the key to elide the shuffle'
    claim, proven: write dimension and snapshot bucketed on the key, run
    scd2_merge on the read-back tables, and assert the full-outer merge
    join carries NO shuffle Exchange — the 100 TB dimension-merge recipe."""
    from schemamap_spark.operators.skew import write_bucketed
    from schemamap_spark.plans.dryrun import explain_str

    dim = _dim(spark)
    upd = spark.createDataFrame(
        [(1, "alice", 150.0), (4, "dan", 400.0)],
        "id long, name string, balance double",
    )
    write_bucketed(dim, "b_scd2_dim", "id", 8)
    write_bucketed(upd, "b_scd2_upd", "id", 8)
    out = scd2_merge(
        spark.table("b_scd2_dim"), spark.table("b_scd2_upd"), ["id"], T1
    )
    assert "Exchange hashpartitioning" not in explain_str(out)
    rows = {(r.id, r.balance, r.is_current) for r in out.collect()}
    assert rows == {
        (1, 100.0, False), (1, 150.0, True), (2, 200.0, True),
        (3, 300.0, True), (4, 400.0, True),
    }


def test_scd2_null_key_rows_pass_through(spark):
    dim = scd2_init(
        spark.createDataFrame([(None, "ghost", 1.0), (1, "alice", 100.0)],
                              "id long, name string, balance double"),
        T0,
    )
    upd = spark.createDataFrame([(1, "alice", 150.0)], "id long, name string, balance double")
    out = scd2_merge(dim, upd, ["id"], T1)
    ghosts = out.filter(F.col("id").isNull()).collect()
    assert len(ghosts) == 1 and ghosts[0].name == "ghost"  # not silently dropped
    assert out.count() == 3  # ghost + closed alice + new alice
