"""The ANN commit-log battery over fscommit._CondPutFS — the
conditional-PUT protocol double (VERDICT r9 #2).

The SCALE.md design note argues the versioned commit log needs only the
primitive real object stores expose: an atomic if-absent PUT of complete
content (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, ABFS ETag
preconditions) — no hardlink, no rename in the claim path. This module
PROVES that claim in-container: every fscommit operation routes through
the double (an autouse fixture with its own MonkeyPatch, so imported
tests' monkeypatch.undo() can't strip it), and the battery re-runs the
commit-log lifecycle — append/compact/gc/token idempotency, the stall
guard, lost-claim re-merge, housekeeping-fault isolation, and a real
multi-threaded append storm — plus a guard asserting os.link/os.rename/
os.replace are NEVER invoked on a claim-file target. Green here turns
'documented-not-built' into 'protocol-proven, transport-pending': fs_for
still raises for s3a/gs/abfss until a real connector can run this same
battery end-to-end.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

import schemamap_spark.operators.ann_index as ai
from schemamap_spark.catalog.fixture import DEFAULT_FIXTURE_DIR
from schemamap_spark.operators.ann_index import (
    ConcurrentWriteError,
    ann_index_append,
    ann_index_build,
    ann_index_compact,
    ann_index_gc,
    ann_index_search,
)
from schemamap_spark.sources import fscommit

# re-run the fs-agnostic commit-log tests verbatim over the double (their
# direct-disk peeks work because the double writes claim objects through
# to disk for observability — reads always resolve the overlay first).
# The tests that monkeypatch _LocalFS.rename_exclusive to inject races
# are NOT importable (the double overrides that method), so their
# scenarios are re-pinned below against the double itself.
from test_ann_index import (  # noqa: F401
    test_append_batch_token_idempotent,
    test_compact_folds_batches_preserving_search_and_drift,
    test_compact_reader_race_closed_by_grace_period,
    test_format_marker_written_and_legacy_migration_folds_dirs,
    test_gc_removes_crash_debris_only,
    test_housekeeping_failure_cannot_fail_a_committed_append,
    test_remerge_recognizes_folded_entry,
    test_stalled_writer_claim_on_pruned_slot_is_withdrawn_and_remerged,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        f"{DEFAULT_FIXTURE_DIR}/clustered_embeddings.parquet"
    ).persist()


def _q(emb):
    return emb.filter(F.col("vec_id") % 97 == 0)


@pytest.fixture(autouse=True)
def condput():
    """Route ALL fscommit resolution through one _CondPutFS per test.
    Uses a private MonkeyPatch so imported tests that call their own
    monkeypatch.undo() mid-test cannot strip the double."""
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    double = fscommit._CondPutFS()
    mp.setattr(fscommit, "fs_for", lambda path, spark=None: double)
    yield double
    mp.undo()


def test_lifecycle_and_claims_ride_the_conditional_put(
    spark, emb, condput, tmp_path
):
    """Full lifecycle on the double — and proof the claims actually rode
    the conditional PUT: the overlay carries the version files, and no
    link/rename/replace ever targets a claim file."""
    real_link, real_rename, real_replace = os.link, os.rename, os.replace

    def guard(fn):
        def wrapped(src, dst, *a, **k):
            d = str(dst)
            assert "manifest.v" not in os.path.basename(d) and not d.endswith(
                "manifest.format"
            ), f"claim path used {fn.__name__} on {d}"
            return fn(src, dst, *a, **k)

        return wrapped

    os.link, os.rename, os.replace = (
        guard(real_link), guard(real_rename), guard(real_replace),
    )
    try:
        idx = str(tmp_path / "idx")
        parts = [emb.filter(F.col("vec_id") % 3 == r) for r in range(3)]
        ann_index_build(parts[0], idx, m=8, num_centroids=16,
                        centroids="sample")
        # strip the build-written marker so the first commit has to
        # DECLARE it — the declare must ride the conditional PUT too
        os.unlink(os.path.join(idx, "manifest.format"))
        assert ann_index_append(parts[1], idx) is True
        assert ann_index_append(parts[2], idx) is True
    finally:
        os.link, os.rename, os.replace = real_link, real_rename, real_replace

    # the claims live in the overlay — the conditional PUT carried them
    assert any(
        os.path.basename(k).startswith("manifest.v") for k in condput._blobs
    )
    assert any(
        os.path.basename(k) == "manifest.format" for k in condput._blobs
    )
    head = ai._load_manifest(idx)
    paths = [os.path.join(idx, d["name"]) for d in head["dirs"]]
    assert spark.read.parquet(*paths).count() == emb.count()
    baseline = sorted(
        map(tuple, ann_index_search(spark, idx, _q(emb), k=5,
                                    nprobe=16).collect())
    )
    assert baseline

    # compact + grace + gc, all through the double
    assert ann_index_compact(spark, idx) == 2
    head = ai._load_manifest(idx)
    assert len(head["superseded"]) == 2
    assert sorted(
        map(tuple, ann_index_search(spark, idx, _q(emb), k=5,
                                    nprobe=16).collect())
    ) == baseline
    gone = ann_index_gc(idx, spark, delete_superseded=True)
    assert sorted(gone) == sorted(head["superseded"])
    head = ai._load_manifest(idx)
    assert head["superseded"] == []
    paths = [os.path.join(idx, d["name"]) for d in head["dirs"]]
    assert spark.read.parquet(*paths).count() == emb.count()


def test_lost_claim_remerges_on_conditional_put(
    spark, emb, condput, tmp_path, monkeypatch
):
    """The CAS loop's lost-claim path on conditional-PUT semantics: a
    competitor PUTs the contested version first; the loser re-reads the
    new head, re-merges, claims the next version — both entries
    committed (the _LocalFS twin of this test can't run here because the
    double overrides rename_exclusive)."""
    import json

    idx = str(tmp_path / "idx_lost")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.subtract(b1)
    ann_index_build(b1, idx, m=8, num_centroids=16, centroids="sample")

    real_rx = fscommit._CondPutFS.rename_exclusive
    state = {"raced": False}

    def racing_rx(self, src, dst):
        if "manifest.v" in os.path.basename(dst) and not state["raced"]:
            state["raced"] = True
            head = json.loads(self.read_text(os.path.join(idx, "manifest.json")))
            competitor = {
                **head,
                "dirs": head["dirs"]
                + [{"name": "batch_competitor", "occupancy": {}}],
                "version": int(head.get("version", 0)) + 1,
            }
            with self._lock:  # the competitor's conditional PUT wins
                self._blobs[os.path.abspath(dst)] = json.dumps(competitor)
            raise FileExistsError(dst)
        return real_rx(self, src, dst)

    monkeypatch.setattr(fscommit._CondPutFS, "rename_exclusive", racing_rx)
    assert ann_index_append(b2, idx) is True
    monkeypatch.undo()

    names = {d["name"] for d in ai._load_manifest(idx)["dirs"]}
    assert "batch_competitor" in names
    assert sum(
        n.startswith("batch_") and n != "batch_competitor" for n in names
    ) == 1


def test_concurrent_append_storm_on_conditional_put(
    spark, emb, condput, tmp_path
):
    """Real uncoordinated threads against the double — the exactly-one-
    winner guarantee comes from the if-absent PUT alone. Zero silent
    losses, zero duplicates (the in-test sibling of
    `tools/ann_race_probe.py ... condput`)."""
    idx = str(tmp_path / "idx_storm")
    ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), idx, m=8, num_centroids=16,
        centroids="sample",
    )
    batches = []
    for k in range(12):
        df = emb.limit(40).select(
            (F.col("vec_id") + 100_000 * (k + 1)).alias("vec_id"),
            "embedding",
        ).cache()
        df.count()
        batches.append(df)

    results: list = []
    lock = threading.Lock()

    def worker(tid: int) -> None:
        for i, df in enumerate(batches):
            if i % 4 != tid:
                continue
            try:
                out = ann_index_append(df, idx)
            except ConcurrentWriteError:
                out = "loud"
            except BaseException as e:  # any other escape is a bug
                out = f"bug:{type(e).__name__}:{e}"
            with lock:
                results.append(out)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    bugs = [r for r in results if isinstance(r, str) and r.startswith("bug:")]
    assert not bugs, bugs
    committed = sum(1 for r in results if r is True)
    loud = sum(1 for r in results if r == "loud")
    assert committed + loud == 12 and committed > 0

    head = ai._load_manifest(idx)
    entries = [d for d in head["dirs"] if d["name"] != "codes"]
    assert len(entries) == committed  # zero silent losses
    store = spark.read.parquet(
        *(os.path.join(idx, d["name"]) for d in entries)
    )
    assert store.count() == committed * 40
    assert store.select("vec_id").distinct().count() == committed * 40
    # loud failures leave only unreferenced debris; gc collects exactly it
    assert len(ann_index_gc(idx, spark)) == loud
