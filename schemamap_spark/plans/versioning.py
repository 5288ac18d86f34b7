"""Versioned metadata bootstrap (Flyway parity).

The reference evolves its in-database SDK through 13 Flyway migrations with a
schema-history table (clojure/src/io/schemamap/core.clj:9-16); re-running
init applies only the migrations not yet recorded. The Spark engine mirrors
that with a JSON history file in the warehouse: each migration is
(version, description, action); apply_migrations() skips versions already in
the history, so upgrades between engine versions are a re-run of init.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Migration:
    version: int
    description: str
    action: Callable[[], None]


class SchemaVersionStore:
    """schema-history bookkeeping — one JSON file, atomically replaced."""

    def __init__(self, warehouse_dir: str):
        self.path = os.path.join(warehouse_dir, "schema_version.json")

    def history(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return json.load(f).get("history", [])

    def current(self) -> int:
        hist = self.history()
        return max((h["version"] for h in hist), default=0)

    def record(self, version: int, description: str) -> None:
        hist = self.history()
        hist.append({
            "version": version,
            "description": description,
            "applied_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        })
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path), prefix=".ver_")
        with os.fdopen(fd, "w") as f:
            json.dump({"history": hist}, f, indent=2)
        os.replace(tmp, self.path)  # atomic on POSIX


def apply_migrations(
    store: SchemaVersionStore,
    migrations: list[Migration],
    dry_run: bool = False,
) -> list[str]:
    """Apply every migration above the current version, in order; record each
    in the history. Returns the descriptions of what ran (or would run)."""
    current = store.current()
    pending = sorted(
        (m for m in migrations if m.version > current), key=lambda m: m.version
    )
    done = []
    for m in pending:
        if not dry_run:
            m.action()
            store.record(m.version, m.description)
        done.append(f"V{m.version:06d}: {m.description}")
    return done
