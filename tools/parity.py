"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at a given sf dir, compares:
  - row count
  - column names (sorted)
  - order-insensitive value hash (canonicalized cell rendering)

Both sides are fetched THROUGH PANDAS (sdf.toPandas() / con.fetchdf()), not
fetchall(), to reproduce the driver's canonicalization: DuckDB HUGEINT and
DECIMAL become float64 through the pandas path, and a hash built from Python
ints would false-green exactly the dtype divergence the driver flags (the
round-3 events_* failures). Dtype fidelity is part of the contract.

Usage: python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def pandas_rows(df) -> list[tuple]:
    """Rows from a pandas frame with numpy scalars unwrapped to Python types.

    np.float64 -> float (repr shows the dtype coercion we must detect),
    np.int64 -> int, Timestamp -> datetime, ndarray -> list. NaT -> None.
    """
    import numpy as np
    import pandas as pd

    def norm(v):
        if v is None or v is pd.NaT:
            return None
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        if isinstance(v, np.ndarray):
            return [norm(x) for x in v.tolist()]
        if isinstance(v, (list, tuple)):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        return v

    return [tuple(norm(v) for v in t) for t in df.itertuples(index=False, name=None)]


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and represent with repr (shortest round-trip)
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return canon_cell(float(v))
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import duckdb

    import __spark_entry__ as entrymod
    from schemamap_spark.session import get_spark

    spark = get_spark("parity", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    from schemamap_spark.suite.extra import EXTRA_ORACLE_SQL, EXTRA_SPARK_QUERIES

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # parity-only coverage beyond the driver's 50-slot cap (suite/extra.py)
    queries.update(EXTRA_SPARK_QUERIES)
    oracles.update(EXTRA_ORACLE_SQL)
    failures, skipped = [], []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
        except Exception as e:
            # golden-checked queries refuse scales their committed golden
            # wasn't generated from — a skip here, a red row anywhere else
            if type(e).__name__ == "GoldenScaleMismatch":
                skipped.append(name)
                print(f"  {name:28s} SKIP ({e})")
                continue
            raise
        spdf = sdf.toPandas()
        srows = pandas_rows(spdf)
        scols = list(spdf.columns)
        if name not in oracles:
            skipped.append(name)
            print(f"  {name:28s} rows={len(srows):6d}  (no oracle — rows-only)")
            continue
        ddf = con.sql(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = pandas_rows(ddf.fetchdf())

        ok_cols = sorted(scols) == sorted(dcols)
        ok_cnt = len(srows) == len(drows)
        sh = value_hash(scols, srows)
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK " if (ok_cols and ok_cnt and ok_hash) else "FAIL"
        print(
            f"  {name:28s} {status} rows {len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else scols} hash {sh}/{dh}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {scols}\n      duck  cols: {dcols}")
            if ok_cols and ok_cnt and not ok_hash:
                # show first differing canonical rows
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                rs = sorted("|".join(canon_cell(r[i]) for i in order_s) for r in srows)
                rd = sorted("|".join(canon_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(rs, rd):
                    if a != b:
                        print(f"      spark: {a}\n      duck : {b}")
                        break
    print(f"\n{len(failures)} failures, {len(skipped)} rows-only")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
