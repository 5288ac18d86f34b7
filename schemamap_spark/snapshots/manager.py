"""Warehouse snapshot / restore / list — dev-workflow parity with the
reference CLI's snapshot commands (rust/src/porcelain.rs:165-263, backed by
CREATE DATABASE … TEMPLATE in rust/schemamap_dev.sql:102-140).

Spark rendition: a warehouse is a directory of parquet tables; a snapshot is
a named directory-level copy plus a bookkeeping entry recording git
branch/rev and creation time (the reference stores the same fields in its
`snapshots` table, rust/schemamap_dev.sql:34-40). Copies are storage-level
(no Spark job), mirroring the reference's template-database trick.

Filesystem contract (round 8): all copy/swap/bookkeeping rides the
sources/fscommit seam, like every other store in the repo — plain paths
keep the byte-identical os/shutil behavior (no Spark session needed);
``scheme://`` warehouses (file://, hdfs://) take the Hadoop FileSystem
API on the session JVM. The git-metadata shellout stays driver-local by
design: it records the state of the developer's CHECKOUT (the reference
snapshots table's git_branch/git_rev), which lives on the driver
regardless of where the warehouse bytes live.
"""

from __future__ import annotations

import datetime as dt
import json
import subprocess

from schemamap_spark.sources import fscommit
from schemamap_spark.sources.fscommit import join


def _normalize(path: str) -> str:
    """Canonical spelling for inside-ness comparison: plain paths resolve
    through abspath+normpath (collapses '//', '.', relative forms);
    scheme paths collapse duplicate slashes in the path part and drop the
    trailing slash — URIs have no cwd to resolve against."""
    import os
    import re

    scheme = fscommit.split_scheme(path)
    if scheme is None:
        return os.path.normpath(os.path.abspath(path))
    rest = path[len(scheme) + 3:]
    return scheme + "://" + re.sub("/{2,}", "/", rest).rstrip("/")


class SnapshotManager:
    def __init__(
        self,
        warehouse_dir: str,
        snapshots_dir: str | None = None,
        spark=None,
    ):
        self.warehouse_dir = warehouse_dir.rstrip("/")
        self.snapshots_dir = (snapshots_dir or join(self.warehouse_dir, ".snapshots")).rstrip("/")
        self._fs = fscommit.fs_for(self.warehouse_dir, spark)
        # the snapshot store rides inside the warehouse by default; an
        # explicit external snapshots_dir must live on the SAME filesystem
        # (restore renames between the two — renames don't cross schemes)
        if fscommit.split_scheme(self.snapshots_dir) != fscommit.split_scheme(
            self.warehouse_dir
        ):
            raise ValueError(
                "snapshots_dir must be on the same filesystem as the "
                f"warehouse ({self.snapshots_dir!r} vs {self.warehouse_dir!r})"
            )
        self._fs.mkdirs(self.snapshots_dir)
        self._meta_path = join(self.snapshots_dir, "snapshots.json")
        # inside-ness must be decided on NORMALIZED paths: a raw string
        # compare would misclassify '/wh//.snapshots' or a relative
        # spelling as EXTERNAL, and restore() would then rename the
        # warehouse (physically containing the store) aside and delete
        # it — destroying every snapshot. An inside store anywhere other
        # than .snapshots would be destroyed the same way, so refuse it.
        wh_n = _normalize(self.warehouse_dir)
        sn_n = _normalize(self.snapshots_dir)
        self._inside = sn_n == join(wh_n, ".snapshots")
        if not self._inside and sn_n.startswith(wh_n + "/"):
            raise ValueError(
                "a snapshots_dir inside the warehouse must be exactly "
                f"<warehouse>/.snapshots (got {self.snapshots_dir!r}) — "
                "restore() swaps the warehouse directory wholesale and "
                "only knows how to carry the .snapshots store across"
            )

    def _load_meta(self) -> list[dict]:
        if self._fs.exists(self._meta_path):
            return json.loads(self._fs.read_text(self._meta_path))
        return []

    def _save_meta(self, meta: list[dict]) -> None:
        self._fs.write_text(self._meta_path, json.dumps(meta, indent=2, sort_keys=True))

    def _git_cwd(self) -> str | None:
        """Where to ask git about the checkout: the warehouse dir itself
        when it is a plain local path (the pre-r8 behavior), its local
        rendition for file:// — otherwise (hdfs://) the driver's cwd,
        since a remote warehouse has no checkout to inspect."""
        scheme = fscommit.split_scheme(self.warehouse_dir)
        if scheme is None:
            return self.warehouse_dir
        if scheme == "file":
            return self.warehouse_dir[len("file://"):] or "/"
        return None

    @staticmethod
    def _git_info(cwd: str | None) -> tuple[str | None, str | None]:
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
        dest = join(self.snapshots_dir, name)
        if self._fs.exists(dest):
            raise ValueError(f"snapshot {name!r} already exists")
        t0 = dt.datetime.now(dt.timezone.utc)
        self._fs.copydir(self.warehouse_dir, dest, ignore_names=(".snapshots",))
        branch, rev = self._git_info(self._git_cwd())
        entry = {
            "db_name": name,
            "template_db_name": fscommit.basename(self.warehouse_dir),
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
        src = join(self.snapshots_dir, name)
        if not self._fs.isdir(src):
            raise FileNotFoundError(f"no snapshot named {name!r}")
        t0 = dt.datetime.now(dt.timezone.utc)
        # atomic-ish: build alongside, then swap (readers of old files finish)
        staging = self.warehouse_dir + ".restoring"
        if self._fs.exists(staging):
            self._fs.delete(staging)
        self._fs.copydir(src, staging)
        old = self.warehouse_dir + ".old"
        if self._fs.exists(old):
            self._fs.delete(old)  # stale leftover from an interrupted restore
        self._fs.rename(self.warehouse_dir, old)
        self._fs.rename(staging, self.warehouse_dir)
        if self._inside:  # carry the snapshot store across the swap
            self._fs.rename(join(old, ".snapshots"), self.snapshots_dir)
        self._fs.delete(old)
        return {
            "restored": name,
            "elapsed_ms": int((dt.datetime.now(dt.timezone.utc) - t0).total_seconds() * 1000),
        }

    def list(self) -> list[dict]:
        return sorted(self._load_meta(), key=lambda e: e["created_at"], reverse=True)

    def drop(self, name: str) -> None:
        src = join(self.snapshots_dir, name)
        if self._fs.isdir(src):
            self._fs.delete(src)
        self._save_meta([e for e in self._load_meta() if e["db_name"] != name])
