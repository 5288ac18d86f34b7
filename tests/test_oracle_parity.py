"""Replicates the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.01 — row count, sorted column names, order-insensitive
value hash. This is the strongest signal the repo produces; keep it green.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity import TESTDATA_TABLES, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    yield con


def _pairs():
    import __spark_entry__ as e

    from schemamap_spark.suite.extra import EXTRA_ORACLE_SQL, EXTRA_SPARK_QUERIES

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) == 50, "driver registry must stay exactly 50 entries"
    qs = {**qs, **EXTRA_SPARK_QUERIES}
    oracles = {**oracles, **EXTRA_ORACLE_SQL}
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    if oracle is None:
        assert srows is not None  # rows-only contract: runs and returns
        return

    ddf = duck.sql(oracle)
    dcols = [d[0] for d in ddf.description]
    drows = [tuple(r) for r in ddf.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert value_hash(scols, srows) == value_hash(dcols, drows), f"{name}: value hash differs"


def test_except_semantics_with_duplicate_keys(spark, duck):
    """q29's except stage uses subtract (EXCEPT DISTINCT semantics) to match
    the oracle's EXCEPT. Pin that on a frame with DUPLICATE left keys — the
    shape where exceptAll and EXCEPT diverge (exceptAll would emit leftover
    duplicates; EXCEPT emits each surviving key once)."""
    left = spark.createDataFrame([(1,), (1,), (2,), (2,), (3,)], "nk int")
    right = spark.createDataFrame([(2,), (9,)], "nk int")
    got = sorted(r.nk for r in left.subtract(right).collect())
    want = sorted(
        r[0]
        for r in duck.sql(
            "select * from (values (1),(1),(2),(2),(3)) l(nk) "
            "except select * from (values (2),(9)) r(nk)"
        ).fetchall()
    )
    assert got == want == [1, 3]


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.fieldNames() == ["n_name", "o_orderstatus", "cnt"]
