"""Dry-run plans and plan inspection.

The reference CLI can run `init` in dry-run mode, PRINTING every DDL step
instead of executing (an interpreter over Option<Client> —
rust/src/init.rs:72-77, 94-97, 111-121). The Spark engine mirrors that: every
bootstrap step is a (description, action) pair; dry_run renders the plan,
execute runs it. `explain_str` exposes Catalyst's formatted physical plan for
perf review (pushed filters, broadcast vs shuffle joins, codegen spans).
"""

from __future__ import annotations

import io
from collections.abc import Callable
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_json(df: DataFrame) -> dict:
    qe = df._jdf.queryExecution()
    return {
        "logical": qe.analyzed().toString(),
        "optimized": qe.optimizedPlan().toString(),
        "physical": qe.executedPlan().toString(),
    }


def tables_in_plan(df: DataFrame) -> list[str]:
    """Source tables/files referenced by a DataFrame's analyzed plan — the
    Spark rendition of the reference doctor's MDE plan-walk, which extracts
    the table set from a user's MDE view definition (rust/src/doctor.rs:
    252-264, incl. its `left join … and false` declared-relation idiom:
    constant-false joins still name their relation in the plan)."""
    plan = df._jdf.queryExecution().analyzed()
    out: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name == "SubqueryAlias":
            out.append(str(node.identifier()))
        elif name == "LogicalRelation":
            # file-backed relation: surface its root path(s)
            try:
                paths = node.relation().location().rootPaths()
                for i in range(paths.size()):
                    out.append(str(paths.apply(i)))
            except Exception:
                out.append(node.simpleString(100)[:80])
        elif "Relation" in name:
            out.append(node.simpleString(100)[:80])
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    seen: set[str] = set()
    uniq = []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


@dataclass
class InitPlan:
    """Ordered bootstrap steps with dry-run support (engine init parity)."""

    steps: list[tuple[str, Callable[[], None]]] = field(default_factory=list)

    def add(self, description: str, action: Callable[[], None]) -> "InitPlan":
        self.steps.append((description, action))
        return self

    def render(self) -> str:
        return "\n".join(f"{i + 1}. {d}" for i, (d, _) in enumerate(self.steps))

    def execute(self, dry_run: bool = False) -> list[str]:
        done = []
        for desc, action in self.steps:
            if not dry_run:
                action()
            done.append(desc)
        return done
