"""CLI porcelain + snapshot manager + dry-run plan + count estimate."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run_cli(*args: str) -> tuple[int, str, str]:
    env = dict(os.environ, PYTHONPATH="/root/repo")
    p = subprocess.run(
        [sys.executable, "-m", "schemamap_spark.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    return p.returncode, p.stdout, p.stderr


def test_cli_init_dry_run():
    code, out, _ = _run_cli("init", "--dry-run", "--warehouse", "/tmp/smwh_test")
    assert code == 0
    doc = json.loads(out)
    assert doc["dry_run"] is True
    assert len(doc["plan"]) == 4
    assert not os.path.exists("/tmp/smwh_test")  # dry run must not create


def test_cli_status_json():
    code, out, _ = _run_cli("status")
    assert code == 0
    doc = json.loads(out)
    assert doc["column_count"] > 1300
    assert doc["schema_count"] >= 10


def test_snapshot_roundtrip(tmp_path):
    from schemamap_spark.snapshots import SnapshotManager

    wh = tmp_path / "warehouse"
    wh.mkdir()
    (wh / "t.parquet").write_bytes(b"v1")
    mgr = SnapshotManager(str(wh))
    entry = mgr.create("before")
    assert entry["db_name"] == "before"

    (wh / "t.parquet").write_bytes(b"v2-changed")
    mgr2 = SnapshotManager(str(wh))
    mgr2.restore("before")
    assert (wh / "t.parquet").read_bytes() == b"v1"
    assert [e["db_name"] for e in SnapshotManager(str(wh)).list()] == ["before"]

    SnapshotManager(str(wh)).drop("before")
    assert SnapshotManager(str(wh)).list() == []


def test_count_estimate_close(engine, spark):
    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    est = engine.count_estimate(df)
    exact = df.count()
    assert abs(est - exact) / exact < 0.1  # SURVEY Q21 contract


def test_init_plan_dry_run_does_not_execute():
    from schemamap_spark.plans.dryrun import InitPlan

    hits = []
    plan = InitPlan().add("step1", lambda: hits.append(1)).add("step2", lambda: hits.append(2))
    assert plan.execute(dry_run=True) == ["step1", "step2"]
    assert hits == []
    plan.execute()
    assert hits == [1, 2]
