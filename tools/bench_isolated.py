"""Isolated per-query bench: run ONE named suite query in a fresh process
(1 cold + N warm reps, noop-materialized) so cross-query session effects —
cache pressure, JIT state, GC debt from earlier queries — can't contaminate
the timing. This is the r3 text_profile playbook, kept as a tool: when a
shared-session bench number moves without a code change, the isolated
series is the arbiter.

Single-query usage (unchanged):
    python tools/bench_isolated.py QUERY [reps] [sf_dir]
Prints one JSON line {"query":..., "cold":..., "warm":[...], "warm_median":...}.

Suite usage (VERDICT r12 #2 — make the drift arbitration a committed,
diffable ARTIFACT instead of ROUND_NOTES prose):
    python tools/bench_isolated.py --suite [reps] [sf_dir] [--out FILE]
Runs every bench.py HEADLINE query, each in its OWN fresh process (one
subprocess per query — full isolation, not just per-query sessions), and
writes FILE (default BENCH_ISOLATED.json at the repo root; at round close
name it BENCH_ISOLATED_rNN.json and commit it) with per-query cold/warm
series plus the warm-median total, comparable 1:1 against the driver's
BENCH_rNN.json "queries" map.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _run_one(name: str, reps: int, sf_dir: str) -> dict:
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
    return {
        "query": name,
        "sf_dir": sf_dir,
        "cold": runs[0],
        "warm": warm,
        "warm_median": sorted(warm)[len(warm) // 2],
    }


def _run_suite(reps: int, sf_dir: str, out: str | None) -> None:
    # the headline list lives in bench.py — one source of truth, so the
    # isolated artifact stays 1:1 comparable with the driver's BENCH_rNN
    import bench

    results: dict[str, dict] = {}
    for name in bench.HEADLINE:
        # one fresh PROCESS per query: a new JVM, new codegen cache, new
        # GC state — the strongest isolation this host offers
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name, str(reps), sf_dir],
            capture_output=True,
            text=True,
            cwd=_REPO,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except ValueError:
            results[name] = {
                "query": name,
                "error": (proc.stderr or "no output")[-2000:],
            }
        print(line or f"# {name}: FAILED", file=sys.stderr)
    ok = [r for r in results.values() if "warm_median" in r]
    doc = {
        "metric": "bench_isolated_suite",
        "sf_dir": sf_dir,
        "reps": reps,
        "total_warm_median": round(sum(r["warm_median"] for r in ok), 3),
        "queries": {
            n: (
                {"cold": r["cold"], "warm": r["warm"], "warm_median": r["warm_median"]}
                if "warm_median" in r
                else {"error": r["error"]}
            )
            for n, r in results.items()
        },
    }
    if out:
        with open(out, "w") as f:
            f.write(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))


def main() -> None:
    args = list(sys.argv[1:])
    out = None
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    if args and args[0] == "--suite":
        reps = int(args[1]) if len(args) > 1 else 3
        sf_dir = args[2] if len(args) > 2 else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        _run_suite(reps, sf_dir, out or os.path.join(_REPO, "BENCH_ISOLATED.json"))
        return
    name = args[0]
    reps = int(args[1]) if len(args) > 1 else 3
    sf_dir = args[2] if len(args) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    print(json.dumps(_run_one(name, reps, sf_dir)))


if __name__ == "__main__":
    main()
