"""Capture .explain("formatted") for every bench.py HEADLINE query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence trail
(guide §1: measure first; the judge checks plan claims against these files).

Usage:
    python tools/bench_plans.py before [sf_dir] [--tag r18] [queries...]

Writes plans/<tag>/<query>_<before|after>.txt. One shared session (plan
capture is driver-side only; no actions run beyond broadcast-size
estimation Spark itself performs during planning).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = "r18"
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    suffix = args[0] if args else "before"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    only = set(args[2:])

    import bench

    from schemamap_spark.session import get_spark

    registry = bench.headline_registry()
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("bench-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = sorted(
            {
                j
                for j in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
                if j in plan
            }
        )
        print(f"{name}: Exchange={n_ex} joins={joins} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
