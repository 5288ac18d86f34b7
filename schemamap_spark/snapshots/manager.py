"""Warehouse snapshot / restore / list — dev-workflow parity with the
reference CLI's snapshot commands (rust/src/porcelain.rs:165-263, backed by
CREATE DATABASE … TEMPLATE in rust/schemamap_dev.sql:102-140).

Spark rendition: a warehouse is a directory of parquet tables; a snapshot is
a named directory-level copy plus a bookkeeping entry recording git
branch/rev and creation time (the reference stores the same fields in its
`snapshots` table, rust/schemamap_dev.sql:34-40). Copies are storage-level
(no Spark job), mirroring the reference's template-database trick.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import subprocess


class SnapshotManager:
    def __init__(self, warehouse_dir: str, snapshots_dir: str | None = None):
        self.warehouse_dir = warehouse_dir
        self.snapshots_dir = snapshots_dir or os.path.join(warehouse_dir, ".snapshots")
        os.makedirs(self.snapshots_dir, exist_ok=True)
        self._meta_path = os.path.join(self.snapshots_dir, "snapshots.json")

    def _load_meta(self) -> list[dict]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return []

    def _save_meta(self, meta: list[dict]) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)

    @staticmethod
    def _git_info(cwd: str) -> tuple[str | None, str | None]:
        def run(*args):
            try:
                return subprocess.run(
                    ["git", *args], cwd=cwd, capture_output=True, text=True, timeout=10
                ).stdout.strip() or None
            except Exception:
                return None

        return run("rev-parse", "--abbrev-ref", "HEAD"), run("rev-parse", "--short", "HEAD")

    def create(self, name: str) -> dict:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid snapshot name: {name!r}")
        dest = os.path.join(self.snapshots_dir, name)
        if os.path.exists(dest):
            raise ValueError(f"snapshot {name!r} already exists")
        t0 = dt.datetime.now(dt.timezone.utc)
        shutil.copytree(self.warehouse_dir, dest, ignore=shutil.ignore_patterns(".snapshots"))
        branch, rev = self._git_info(self.warehouse_dir)
        entry = {
            "db_name": name,
            "template_db_name": os.path.basename(self.warehouse_dir),
            "git_branch": branch,
            "git_rev": rev,
            "created_at": t0.isoformat(),
            "elapsed_ms": int((dt.datetime.now(dt.timezone.utc) - t0).total_seconds() * 1000),
        }
        meta = self._load_meta()
        meta.append(entry)
        self._save_meta(meta)
        return entry

    def restore(self, name: str) -> dict:
        src = os.path.join(self.snapshots_dir, name)
        if not os.path.isdir(src):
            raise FileNotFoundError(f"no snapshot named {name!r}")
        t0 = dt.datetime.now(dt.timezone.utc)
        # atomic-ish: build alongside, then swap (readers of old files finish)
        staging = self.warehouse_dir + ".restoring"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        shutil.copytree(src, staging)
        snapdir_rel = os.path.relpath(self.snapshots_dir, self.warehouse_dir)
        old = self.warehouse_dir + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)  # stale leftover from an interrupted restore
        os.rename(self.warehouse_dir, old)
        os.rename(staging, self.warehouse_dir)
        if snapdir_rel == ".snapshots":  # carry the snapshot store across the swap
            shutil.move(os.path.join(old, ".snapshots"), self.snapshots_dir)
        shutil.rmtree(old)
        return {
            "restored": name,
            "elapsed_ms": int((dt.datetime.now(dt.timezone.utc) - t0).total_seconds() * 1000),
        }

    def list(self) -> list[dict]:
        return sorted(self._load_meta(), key=lambda e: e["created_at"], reverse=True)

    def drop(self, name: str) -> None:
        src = os.path.join(self.snapshots_dir, name)
        if os.path.isdir(src):
            shutil.rmtree(src)
        self._save_meta([e for e in self._load_meta() if e["db_name"] != name])
