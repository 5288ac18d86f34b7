"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints exactly ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Query set = the operator classes that dominate real workloads: scan+filter,
shuffled join/agg, top-k, set-agg, status (catalog analytics end-to-end),
dedup (minhash LSH), ANN top-k, text analysis, event windowing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_scan",
    "q02_filter_in",
    "q03_join_agg",
    "q08_collect_set",
    "q12_topk",
    "q19_map_agg",
    "q22_status",
    "q23_candidates",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_cosine",
    "text_profile",
    "events_tumbling_window",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from schemamap_spark.session import get_spark
    from schemamap_spark.suite import SPARK_QUERIES

    spark = get_spark("schemamap-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # one warm-up action so JVM/codegen startup doesn't pollute query timings
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = SPARK_QUERIES[name]
        best = None
        # best-of-2: first run pays one-time codegen/JIT compilation; the
        # second reflects steady-state engine throughput (run-to-run noise
        # on a shared box otherwise dominates round comparisons)
        for _ in range(2):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()  # materialize fully (collect would skew with driver transfer)
            elapsed = round(time.monotonic() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = best
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
