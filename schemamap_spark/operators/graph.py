"""Iterative graph operators.

`transitive_closure` is the Spark rendering of the reference doctor's
`WITH RECURSIVE role_hierarchy` query (reference rust/src/doctor.rs:58-83):
an iterative frontier-join fixpoint.

Scale notes:
- each round is ONE shuffled equi-join on the frontier (which shrinks as the
  fixpoint approaches) plus a distinct; the accumulated closure is
  localCheckpoint()ed every round to truncate lineage — without that, plan
  depth grows linearly with graph diameter and planning cost quadratically.
- `max_iterations` bounds runaway growth on cyclic graphs; dedup against the
  accumulator makes cycles terminate naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "member",
    dst: str = "roleof",
    max_iterations: int = 30,
) -> DataFrame:
    """All (src, dst) pairs reachable via 1..n hops. Output columns = (src, dst)."""
    base = edges.select(src, dst).distinct()
    acc = base.localCheckpoint()
    frontier = acc

    for _ in range(max_iterations):
        stepped = (
            frontier.alias("f")
            .join(base.alias("e"), F.col(f"f.{dst}") == F.col(f"e.{src}"))
            .select(F.col(f"f.{src}").alias(src), F.col(f"e.{dst}").alias(dst))
            .distinct()
        )
        new = stepped.join(acc, on=[src, dst], how="left_anti").localCheckpoint()
        if new.isEmpty():
            break
        acc = acc.unionByName(new).localCheckpoint()
        frontier = new
    return acc
