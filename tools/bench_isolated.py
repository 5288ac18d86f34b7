"""Isolated per-query bench: run ONE named suite query in a fresh process
(1 cold + N warm reps, noop-materialized) so cross-query session effects —
cache pressure, JIT state, GC debt from earlier queries — can't contaminate
the timing. This is the r3 text_profile playbook, kept as a tool: when a
shared-session bench number moves without a code change, the isolated
series is the arbiter.

Usage: python tools/bench_isolated.py QUERY [reps] [sf_dir]
Prints one JSON line {"query":..., "cold":..., "warm":[...], "warm_median":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from schemamap_spark.session import get_spark
    from schemamap_spark.suite import SPARK_QUERIES
    from schemamap_spark.suite.extra import EXTRA_SPARK_QUERIES
    from schemamap_spark.suite.relational import q12_topk

    registry = {**SPARK_QUERIES, **EXTRA_SPARK_QUERIES, "q12_topk": q12_topk}
    fn = registry[name]

    spark = get_spark("bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    runs = []
    for _ in range(1 + reps):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    warm = runs[1:]
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "cold": runs[0],
        "warm": warm,
        "warm_median": sorted(warm)[len(warm) // 2],
    }))


if __name__ == "__main__":
    main()
