"""Skew-/size-safe set aggregation: equality with the naive form, caps,
and plan shape (two shuffle rounds for the two-level variant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schemamap_spark.operators.agg import bounded_collect_set, two_level_collect_set


def _hotkey_df(spark):
    # key "hot": 5000 rows over 37 distinct values; key "cold": 10 rows/10 vals
    rows = [("hot", f"v{i % 37:03d}") for i in range(5000)]
    rows += [("cold", f"w{i}") for i in range(10)]
    return spark.createDataFrame(rows, "k string, v string").repartition(16)


def test_two_level_equals_plain_collect_set(spark):
    df = _hotkey_df(spark)
    plain = {
        r.k: r.vals
        for r in df.groupBy("k").agg(F.sort_array(F.collect_set("v")).alias("vals")).collect()
    }
    for salt in (1, 4, 16):
        two = {r.k: r.values for r in two_level_collect_set(df, ["k"], "v", salt=salt).collect()}
        assert two == plain, f"salt={salt}"
    assert len(plain["hot"]) == 37 and len(plain["cold"]) == 10


def test_bounded_keeps_limit_smallest_exactly(spark):
    df = _hotkey_df(spark)
    got = {r.k: r.v_first5 for r in bounded_collect_set(df, ["k"], "v", limit=5).collect()}
    assert got["hot"] == [f"v{i:03d}" for i in range(5)]
    assert got["cold"] == sorted(f"w{i}" for i in range(10))[:5]
    # limit above the domain: whole distinct set, sorted
    all_vals = {r.k: r.out for r in bounded_collect_set(df, ["k"], "v", 1000, out="out").collect()}
    assert all_vals["hot"] == sorted({f"v{i % 37:03d}" for i in range(5000)})


def test_bounded_exact_for_any_salt(spark):
    df = _hotkey_df(spark)
    want = bounded_collect_set(df, ["k"], "v", 7, salt=1).collect()
    for salt in (3, 32):
        got = bounded_collect_set(df, ["k"], "v", 7, salt=salt).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_parameter_validation(spark):
    df = _hotkey_df(spark)
    with pytest.raises(ValueError):
        bounded_collect_set(df, ["k"], "v", 0)
    with pytest.raises(ValueError):
        two_level_collect_set(df, ["k"], "v", salt=0)


def test_bounded_ignores_nulls_like_collect_set(spark):
    df = spark.createDataFrame(
        [("k", None), ("k", 3), ("k", 1), ("k", 2), ("k", None)],
        "k string, v int",
    )
    got = bounded_collect_set(df, ["k"], "v", limit=3).collect()[0]
    assert got[1] == [1, 2, 3]  # nulls neither crash nor consume rank slots
