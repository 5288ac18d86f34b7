"""Scale-evidence dataset: write an N-fold scaled copy of a testdata sf
dir (default sf0.1 ×10 ≈ "sf1") for the VERDICT r18 #7 larger-SF bench
spot-check. /root/testdata is read-only, so the scaled dir lives under
/tmp and is NOT a correctness surface — the oracle never sees it; it
exists purely so the bench can be pointed at a corpus ~10× the usual one
(`SPARK_GRAFT_SF_DIR=/tmp/sf1_x10 python bench.py`) to observe which
queries leave the driver-bound regime.

Fact-table keys are offset per copy (copy i adds i×(max_key+1)) so FK
joins stay consistent: every lineitem still matches exactly one order,
order→customer, etc. Dimensions (region, nation) are NOT scaled — the
TPC-H convention. documents/embeddings share one id space (hybrid
rerank's contract), so both offset by the same stride. Text/vector
payloads are exact copies: point-lookup predicates (isin id lists) still
match only copy 0, which leaves query-side frames bounded — exactly the
100 TB shape (bounded queries, corpus-scale data). Note the dedup
queries see a corpus where EVERY doc has N exact copies, so candidate
pairs grow ~N(N-1)/2 per doc, super-linear by design of the probe — read
their numbers as "harder workload", not "same workload ×N".

Run: python tools/gen_scaled_sfdir.py [out_dir] [factor] [src_dir]
DuckDB on purpose (keeps Spark/the test suite's cores free).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride-group} ; stride-group names a shared id space
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "doc"},
}
UNSCALED = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_x10"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("set threads to 8")

    # one stride per id space: max over every column sharing it, +1
    strides: dict[str, int] = {}
    for table, cols in KEYED.items():
        for col, group in cols.items():
            m = con.execute(
                f"select max({col}) from read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
            strides[group] = max(strides.get(group, 0), int(m) + 1)

    for table in UNSCALED:
        con.execute(
            f"copy (select * from read_parquet('{src}/{table}.parquet')) "
            f"to '{out}/{table}.parquet' (format parquet)"
        )
        print(f"{table}: copied unscaled")

    for table, cols in KEYED.items():
        sel = []
        schema = con.execute(
            f"select * from read_parquet('{src}/{table}.parquet') limit 0"
        ).description
        for name, *_ in schema:
            if name in cols:
                stride = strides[cols[name]]
                sel.append(f"({name} + i * {stride}) as {name}")
            else:
                sel.append(name)
        q = (
            f"copy (select {', '.join(sel)} "
            f"from read_parquet('{src}/{table}.parquet'), "
            f"(select unnest(range({factor})) as i) "
            f"order by i) to '{out}/{table}.parquet' (format parquet)"
        )
        con.execute(q)
        n = con.execute(
            f"select count(*) from read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows (x{factor})")


if __name__ == "__main__":
    main()
