"""ANN store concurrent-append probe: real uncoordinated writer threads.

Appends commit through the store's versioned manifest log
(operators/ann_index._commit_manifest_merge): each committed version is
claimed with an atomic create-exclusive rename and derives from the
version it replaces, so concurrent appends serialize without losing
each other's entries. This probe is why: the first r8 design was a
post-commit verify TRIPWIRE, and this very probe caught it silently
losing 2/48 appends at 8 threads (the verify window is not airtight) —
detection was then upgraded to prevention. The pytest suite pins the
claim loop with MONKEYPATCHED orderings; this probe drives the real
thing — T threads x B appends each against one store on local disk,
with no coordination between them — and checks the invariant:

    ZERO LOSSES. Every append either
      (a) committed: its entry is in the manifest HEAD and its rows are
          readable through the manifest-resolved store, or
      (b) failed LOUDLY (ConcurrentWriteError — pathological contention
          only), leaving an unreferenced dir that ann_index_gc collects.

Nothing in between: no append that returned True whose rows are gone,
no committed-looking dir the manifest silently dropped.

Run:  python tools/ann_race_probe.py [THREADS] [APPENDS_PER_THREAD] [compact] [condput]
Defaults 4 x 4, 1,500 vectors per append, 64 dims. `condput` runs the
whole probe over fscommit._CondPutFS — the conditional-PUT protocol
double (no hardlink, no rename in the claim path) — proving the commit
log holds on the primitive real object stores expose.

With the optional third arg `compact`, ONE compactor thread races the
appender pack for the probe's whole duration (the documented contract:
one compactor at a time, concurrent appends safe). This drives the
claim-loop paths the pytest suite pins only with monkeypatched
orderings: compact's merge folding while appends land mid-fold, the
stall guard's withdraw-and-re-merge against compact's idempotent merge,
and grace-dir collection racing fresh claims. Extra invariant: rows AND
distinct vec_ids both equal committed x N_BATCH — folding must neither
lose nor duplicate a concurrently-appended batch.
"""

from __future__ import annotations

import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
_FLAGS = set(sys.argv[3:])
COMPACT = "compact" in _FLAGS
# `condput` routes every fscommit operation through _CondPutFS — the
# conditional-PUT protocol double (no hardlink, no rename in
# rename_exclusive) — proving the commit log needs only an if-absent PUT
# of complete content, the primitive real object stores expose (SCALE.md
# design note; VERDICT r9 #2)
CONDPUT = "condput" in _FLAGS
N_SEED = 20_000
N_BATCH = 1_500
DIMS = 64


def make_corpus(spark, n: int, seed: int, id_base: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(20, DIMS))
    assign = rng.integers(0, 20, size=n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, DIMS))
    return spark.createDataFrame(
        [
            (int(id_base + i), [float(x) for x in vecs[i]])
            for i in range(n)
        ],
        "vec_id bigint, embedding array<double>",
    )


def main() -> None:
    from schemamap_spark.operators.ann_index import (
        ConcurrentWriteError,
        ann_index_append,
        ann_index_build,
        ann_index_gc,
        ann_index_search,
    )
    from schemamap_spark.session import get_spark

    spark = get_spark("ann-race-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if CONDPUT:
        from schemamap_spark.sources import fscommit

        double = fscommit._CondPutFS()
        fscommit.fs_for = lambda path, spark=None: double
    base = "/tmp/ann_race_probe"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    idx = os.path.join(base, "index")

    seed = make_corpus(spark, N_SEED, seed=3).repartition(16).cache()
    seed.count()
    ann_index_build(seed, idx, m=8, num_centroids=32, centroids="sample")

    # pre-materialize every batch so the race window is dominated by the
    # manifest dance, not by Spark job latency
    batches = []
    for t in range(T):
        for b in range(B):
            k = t * B + b
            df = make_corpus(
                spark, N_BATCH, seed=100 + k, id_base=N_SEED + k * N_BATCH
            ).repartition(4).cache()
            df.count()
            batches.append((t, b, df))

    results: dict[tuple[int, int], str] = {}
    lock = threading.Lock()

    def worker(tid: int) -> None:
        for t, b, df in batches:
            if t != tid:
                continue
            try:
                ok = ann_index_append(df, idx)
                out = "committed" if ok else "skipped"
            except ConcurrentWriteError:
                out = "loud-failure"
            except BaseException as e:  # any OTHER escape is a bug: record it
                out = f"bug:{type(e).__name__}"
            with lock:
                results[(t, b)] = out

    compact_stats = {"folds": 0, "runs": 0, "loud": 0, "bugs": []}
    appenders_done = threading.Event()

    def compactor() -> None:
        from schemamap_spark.operators.ann_index import ann_index_compact

        while not appenders_done.is_set():
            appenders_done.wait(0.3)
            try:
                compact_stats["folds"] += ann_index_compact(spark, idx)
                compact_stats["runs"] += 1
            except ConcurrentWriteError:
                compact_stats["loud"] += 1
            except BaseException as e:
                compact_stats["bugs"].append(type(e).__name__)

    t0 = time.monotonic()
    threads = [threading.Thread(target=worker, args=(t,)) for t in range(T)]
    if COMPACT:
        threads.append(threading.Thread(target=compactor))
    for th in threads:
        th.start()
    for th in threads[:T]:
        th.join()
    appenders_done.set()
    for th in threads[T:]:
        th.join()
    wall = time.monotonic() - t0

    # resolve the TRUE head of the version log — under contention the
    # manifest.json snapshot can lag the newest committed version
    from schemamap_spark.operators.ann_index import _load_manifest

    manifest = _load_manifest(idx)
    committed_dirs = [d for d in manifest["dirs"] if d["name"] != "codes"]
    n_committed = sum(1 for v in results.values() if v == "committed")
    n_loud = sum(1 for v in results.values() if v == "loud-failure")
    bugs = sorted(v for v in results.values() if v.startswith("bug:"))

    # invariant (a): every True append's rows are readable via the manifest
    # — and in compact mode, folding must neither lose nor DUPLICATE a
    # batch (distinct ids catch a double-fold that row counts would too,
    # but distinctness also catches fold-then-refold of the same dir)
    store_df = (
        spark.read.parquet(*(os.path.join(idx, d["name"]) for d in committed_dirs))
        if committed_dirs
        else None
    )
    rows_in_store = store_df.count() if store_df is not None else 0
    distinct_ids = (
        store_df.select("vec_id").distinct().count() if store_df is not None else 0
    )
    expect_rows = n_committed * N_BATCH
    # invariant (b): loud failures leave only unreferenced debris; gc gets
    # it (in compact mode a loud COMPACT can strand its unioned dir too,
    # and grace dirs are reclaimed — counts can exceed loud appends, so
    # the count equality is asserted only in append-only mode)
    debris = ann_index_gc(idx, spark, delete_superseded=COMPACT)
    # search still serves through the manifest
    q = seed.limit(50)
    n_hits = ann_index_search(spark, idx, q, k=5, nprobe=8).count()

    mode = "append+compact" if COMPACT else "append"
    if CONDPUT:
        mode += " (conditional-PUT double)"
    print(f"\n=== ANN store concurrent-{mode} probe ===")
    print(f"{T} threads x {B} appends x {N_BATCH:,} vectors, wall {wall:.1f}s")
    print(f"committed: {n_committed}/{T * B}   loud failures: {n_loud}   "
          f"other escapes: {len(bugs)} {bugs[:3]}   "
          f"silent losses: {T * B - n_committed - n_loud - len(bugs)}")
    if COMPACT:
        print(f"compactor: {compact_stats['runs']} runs folded "
              f"{compact_stats['folds']} dirs, {compact_stats['loud']} loud, "
              f"bugs: {compact_stats['bugs'][:3]}")
        print(f"manifest batch entries after folding: {len(committed_dirs)}")
    else:
        print(f"manifest batch entries: {len(committed_dirs)} "
              f"(== committed: {len(committed_dirs) == n_committed})")
    print(f"rows via manifest: {rows_in_store:,} "
          f"(expected {expect_rows:,}: {rows_in_store == expect_rows}; "
          f"distinct ids match: {distinct_ids == expect_rows})")
    print(f"gc collected {len(debris)} stranded dir(s)"
          + ("" if COMPACT else f" (== loud failures: {len(debris) == n_loud})"))
    print(f"search over the store: {n_hits} hits from 50 queries")
    ok = (
        rows_in_store == expect_rows
        and distinct_ids == expect_rows
        and (T * B - n_committed - n_loud) == 0
        and not bugs
        and not compact_stats["bugs"]
    )
    if not COMPACT:
        ok = ok and len(committed_dirs) == n_committed and len(debris) == n_loud
    print("PASS" if ok else "FAIL")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
