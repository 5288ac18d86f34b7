"""ANN store commit log: real MULTI-PROCESS probe (VERDICT r14 #1).

tools/ann_race_probe.py drives the versioned manifest log with real
uncoordinated THREADS; the pytest battery pins the claim loop with
monkeypatched orderings and the _CondPutFS protocol double. All of that
shares ONE interpreter: one _FORMAT_STATE cache, one _HEAD_SEEN
watermark, one set of _STORE_LOCKS, one OS file-handle table. The
documented residual windows — the cross-process format-verdict race in
_check_format's cache notes, the stall guard's fork-withdrawal — are
exactly the seams only SEPARATE interpreters with independent fs handles
exercise. This probe does that: N worker processes (spawn context — no
inherited state, a cold import each, like N independent drivers) x M
commits each against one store on local disk, no coordination between
them beyond the filesystem itself.

Workers replay ann_index_append's exact commit sequence minus the Spark
encode (the manifest dance is the object under test; the parquet write
is job latency the probe deliberately excludes — same reasoning as the
thread probe's pre-materialized batches): up-front token scan ->
fs.mktempdir(".batch_") -> write content -> rename to batch_* ->
_commit_manifest_entry. A slice of tokens is SHARED between two
processes (an at-least-once driver's replay landing on a different
machine): exactly one twin may win.

A concurrent READER process polls _load_manifest the whole time,
recording every (version, n_dirs) it resolves and any exception — on a
hardlink-capable local fs a resolved head must always be internally
consistent and both series monotone.

Invariants checked by the parent after join (PASS/FAIL, exit 1 on FAIL):
  1. EXACTLY-ONCE PER TOKEN, COMMIT-OR-LOUD: no token appears in the
     head manifest's dirs more than once; at most one contender per
     token returned True; a token ABSENT from the head has only
     loud-failure outcomes (ConcurrentWriteError — the claim loop's
     documented pathological-contention relief valve: work on disk,
     uncommitted, caller retries), and a False ("twin committed")
     return with no committed twin in the head is a silent loss. Zero
     silent losses, zero non-loud escapes. (Onset of loud failures
     observed at ~48 zero-think-time writer processes — far past the
     real path, where a multi-second Spark encode separates any one
     writer's commits; see SCALE.md.)
  2. LINEAR HEAD CHAIN: head.version == len(head.dirs) (v1 carries one
     dir and every retained commit adds exactly one), every retained
     manifest.v{n} parses with version == its filename, consecutive
     retained versions differ by exactly the one appended entry (strict
     superset, +1), store_id constant, no version file above the head.
  3. DISK == MANIFEST: every committed entry's dir exists; every losing
     twin's dir was deleted; no stray batch_*/.batch_* debris beyond
     loud failures (expected zero at this scale).
  4. READER: no exceptions, version and n_dirs series both monotone
     nondecreasing.

Run:  python tools/ann_mp_probe.py [PROCS] [COMMITS_PER_PROC] [SHARE_FRAC]
Defaults 8 x 24, 25% shared tokens. Escalate PROCS until it breaks or
the safety argument is airtight (ROUND_NOTES trap 20 / the r8 probe
standard — this same escalation found the verify-tripwire losing 2/48).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _bootstrap_store(index_dir: str) -> str:
    """A format-2 store skeleton exactly as ann_index_build publishes it
    (manifest v1 = the codes dir, snapshot pointer, format marker) —
    no Spark: the probe never reads the codes parquet."""
    from schemamap_spark.operators import ann_index as ai
    from schemamap_spark.sources import fscommit

    os.makedirs(os.path.join(index_dir, "codes"))
    fs = fscommit.fs_for(index_dir)
    store_id = uuid.uuid4().hex
    manifest0 = {
        "dirs": [{"name": "codes"}],
        "version": 1,
        "store_id": store_id,
    }
    fs.write_text(
        os.path.join(index_dir, ai._version_name(1)), json.dumps(manifest0)
    )
    fs.write_text(os.path.join(index_dir, ai._MANIFEST), json.dumps(manifest0))
    fs.write_text(os.path.join(index_dir, ai._FORMAT_MARKER), "2\n")
    return store_id


def _worker(index_dir: str, results_dir: str, wid: int, tokens: list) -> None:
    """One writer process: M token commits through the real append
    sequence (sans Spark encode). Spawn target — runs in a cold
    interpreter; every outcome (or escape) lands in results/p{wid}.json
    so the parent can account for all of them."""
    from schemamap_spark.operators import ann_index as ai
    from schemamap_spark.sources import fscommit

    fs = fscommit.fs_for(index_dir)
    out = []
    for tok in tokens:
        try:
            # ann_index_append's up-front replay scan (the fast no-op path)
            committed = set()
            for d in ai._load_manifest(index_dir, fs)["dirs"]:
                committed.add(d.get("batch_token"))
                committed.update(d.get("batch_tokens", ()))
            if tok in committed:
                out.append({"token": tok, "outcome": "skipped-upfront"})
                continue
            tmp_dir = fs.mktempdir(index_dir, ".batch_")
            fs.write_text(
                os.path.join(tmp_dir, "part-00000"), f"{wid}:{tok}\n"
            )
            final_name = "batch_" + os.path.basename(tmp_dir)[len(".batch_"):]
            fs.rename(tmp_dir, os.path.join(index_dir, final_name))
            entry = {
                "name": final_name,
                "occupancy": {},
                "batch_token": tok,
            }
            ok = ai._commit_manifest_entry(index_dir, entry, fs)
            out.append({
                "token": tok,
                "name": final_name,
                "outcome": "committed" if ok else "lost-to-twin",
            })
        except ai.ConcurrentWriteError:
            out.append({"token": tok, "outcome": "loud-failure"})
        except (KeyboardInterrupt, SystemExit):
            # an interrupt is the OPERATOR's signal, not a commit-log
            # escape: recording it as "bug:KeyboardInterrupt" would make
            # a Ctrl-C during an escalation run read as a silent-loss-
            # class FAIL. Die without a results file — the parent's
            # missing_results check names the dead worker (review r15)
            raise
        except Exception as e:  # any OTHER escape is a bug: record it
            out.append({
                "token": tok, "outcome": f"bug:{type(e).__name__}:{e}"
            })
    with open(os.path.join(results_dir, f"p{wid}.json"), "w") as f:
        json.dump(out, f)


def _reader(index_dir: str, results_dir: str, stop_path: str) -> None:
    """Poll _load_manifest until the stop sentinel appears: every
    resolved head must parse (the retry loop owns in-flight races), and
    with appends only, version and dirs-count can never go backwards."""
    from schemamap_spark.operators import ann_index as ai
    from schemamap_spark.sources import fscommit

    fs = fscommit.fs_for(index_dir)
    series, errors = [], []
    while not os.path.exists(stop_path):
        try:
            m = ai._load_manifest(index_dir, fs)
            series.append([int(m.get("version", 0)), len(m["dirs"])])
        except (KeyboardInterrupt, SystemExit):
            # operator interrupt, not a commit-log bug — same contract as
            # the worker's interrupt re-raise (review r15): recording it
            # as a reader error would turn a Ctrl-C into an invariant-4
            # FAILURE verdict
            raise
        except Exception as e:
            errors.append(f"{type(e).__name__}: {e}")
        time.sleep(0.002)
    with open(os.path.join(results_dir, "reader.json"), "w") as f:
        json.dump({"series": series, "errors": errors}, f)


def run_probe(
    procs: int = 8,
    commits: int = 24,
    share_frac: float = 0.25,
    base: str | None = None,
) -> dict:
    """Drive the probe and return the verdict dict (importable by pytest;
    __main__ prints and exits on it). Token plan: worker w owns `commits`
    tokens, of which the last n_shared = max(1, round(share_frac *
    commits)) are its SHARED slice; each worker additionally attempts
    worker (w+1) % procs's shared slice, so every shared token has
    exactly two contenders in different processes and every worker makes
    commits + n_shared attempts (the verdict's `attempts` field counts
    these, not procs x commits)."""
    from schemamap_spark.operators import ann_index as ai
    from schemamap_spark.sources import fscommit

    base = base or f"/tmp/ann_mp_probe_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(base, ignore_errors=True)
    index_dir = os.path.join(base, "index")
    results_dir = os.path.join(base, "results")
    os.makedirs(results_dir)
    store_id = _bootstrap_store(index_dir)

    n_shared = max(1, int(round(share_frac * commits))) if share_frac else 0
    n_unique = commits - n_shared
    shared = {
        w: [f"tok-shared-{w}-{j}" for j in range(n_shared)]
        for w in range(procs)
    }
    plans = {
        w: [f"tok-p{w}-{i}" for i in range(n_unique)]
        + shared[w]
        + shared[(w + 1) % procs]  # the twin slots: (w+1)'s shared tokens
        for w in range(procs)
    }
    all_tokens = sorted({t for plan in plans.values() for t in plan})
    shared_tokens = sorted({t for toks in shared.values() for t in toks})

    ctx = mp.get_context("spawn")
    stop_path = os.path.join(base, "stop")
    workers = [
        ctx.Process(target=_worker, args=(index_dir, results_dir, w, plans[w]))
        for w in range(procs)
    ]
    reader = ctx.Process(target=_reader, args=(index_dir, results_dir, stop_path))
    t0 = time.monotonic()
    # the finally owns child cleanup: without it, an interrupt during the
    # join loop never writes the stop sentinel and the reader spins at
    # 2ms polls forever, orphaned across interrupted runs (review r15)
    try:
        reader.start()
        for p in workers:
            p.start()
        for p in workers:
            p.join()
    finally:
        open(stop_path, "w").close()
        reader.join(timeout=30)
        for p in workers + [reader]:
            if p.is_alive():
                p.terminate()
                p.join(timeout=5)
    wall = time.monotonic() - t0

    # ---- gather ----
    outcomes: list[dict] = []
    missing_results = []
    corrupt_results = []
    for w in range(procs):
        path = os.path.join(results_dir, f"p{w}.json")
        # missing = the worker died before writing (spawn import
        # failure, OOM before dump); truncated/unparseable = it died
        # MID-write or a serialization bug — distinct failure messages
        # so an investigation starts from the right theory, and neither
        # crashes the battery (review r15 x3: same ladder as reader.json)
        try:
            outcomes.extend(json.load(open(path)))
        except FileNotFoundError:
            missing_results.append(w)
        except ValueError:
            corrupt_results.append(w)
    # the reader gets the same died-without-results accounting as the
    # workers (review r15): a reader killed mid-run (spawn import
    # failure, OOM, join-timeout terminate) must surface as a FAIL line
    # in the verdict, not as a raw FileNotFoundError that skips the
    # whole invariant battery
    reader_path = os.path.join(results_dir, "reader.json")
    try:
        reader_doc = json.load(open(reader_path))
    except FileNotFoundError:
        reader_doc = {"series": [], "errors": ["reader died without results"]}
    except ValueError:
        # the join-timeout terminate() can SIGTERM the reader MID-WRITE
        # (review r15): a truncated reader.json must fail invariant 4
        # like a missing one, not crash the battery with a JSONDecodeError
        reader_doc = {"series": [], "errors": ["reader results truncated"]}

    fs = fscommit.fs_for(index_dir)
    head = ai._load_manifest(index_dir, fs)
    batch_dirs = [d for d in head["dirs"] if d["name"] != "codes"]
    failures: list[str] = []
    if missing_results:
        failures.append(f"workers died without results: {missing_results}")
    if corrupt_results:
        failures.append(
            f"workers wrote unparseable results (died mid-write or "
            f"serialization bug): {corrupt_results}"
        )

    # 1. exactly-once per token, commit-or-loud
    by_token: dict[str, int] = {}
    for d in batch_dirs:
        t = d.get("batch_token")
        by_token[t] = by_token.get(t, 0) + 1
    dupes = {t: c for t, c in by_token.items() if c != 1}
    if dupes:
        failures.append(f"tokens in head more than once: {dupes}")
    if set(by_token) - set(all_tokens):
        failures.append(
            f"head carries unknown tokens: {sorted(set(by_token) - set(all_tokens))[:5]}"
        )
    n_committed = sum(1 for o in outcomes if o["outcome"] == "committed")
    n_lost = sum(1 for o in outcomes if o["outcome"] in
                 ("lost-to-twin", "skipped-upfront"))
    n_loud = sum(1 for o in outcomes if o["outcome"] == "loud-failure")
    bugs = [o for o in outcomes if o["outcome"].startswith("bug:")]
    if bugs:
        failures.append(f"non-loud escapes: {bugs[:3]}")
    # per token: at most one True; and the head reflects exactly the
    # tokens someone successfully committed. A token absent from the
    # head may carry ONLY loud failures — any "committed" outcome
    # missing from the head, or any "twin committed" (False) outcome
    # whose token never made the head, is a SILENT loss.
    for tok in all_tokens:
        got = [o["outcome"] for o in outcomes if o["token"] == tok]
        wins = sum(1 for g in got if g == "committed")
        if wins > 1:
            failures.append(f"token {tok}: {wins} winners")
        in_head = tok in by_token
        if wins and not in_head:
            failures.append(f"SILENT LOSS: {tok} committed but not in head")
        if not wins and in_head:
            failures.append(f"token {tok} in head but no worker won it")
        if not in_head and any(
            g in ("lost-to-twin", "skipped-upfront") for g in got
        ):
            failures.append(
                f"SILENT LOSS: {tok} reported twin-committed, head has neither"
            )
    uniq = set(all_tokens) - set(shared_tokens)

    # 2. linear head chain over the retained window
    if int(head.get("version", 0)) != len(head["dirs"]):
        failures.append(
            f"head version {head.get('version')} != n_dirs {len(head['dirs'])}"
        )
    retained = sorted(
        int(nm[len(ai._MANIFEST_V_PREFIX):-5])
        for nm in fs.listdir(index_dir)
        if nm.startswith(ai._MANIFEST_V_PREFIX) and nm.endswith(".json")
    )
    if retained[-1] != int(head["version"]):
        failures.append(f"version file above/below head: {retained[-5:]} "
                        f"vs head {head['version']}")
    prev = None
    for v in retained:
        doc = json.loads(fs.read_text(
            os.path.join(index_dir, ai._version_name(v))))
        if int(doc.get("version", -1)) != v:
            failures.append(f"v{v} file carries version {doc.get('version')}")
        if doc.get("store_id") != store_id:
            failures.append(f"v{v} store_id changed")
        if len(doc["dirs"]) != v:
            failures.append(f"v{v} has {len(doc['dirs'])} dirs, expected {v}")
        if prev is not None and prev[0] == v - 1:
            names_prev = {d["name"] for d in prev[1]["dirs"]}
            names_v = {d["name"] for d in doc["dirs"]}
            if not (names_prev < names_v and len(names_v - names_prev) == 1):
                failures.append(
                    f"v{v} does not extend v{v - 1} by exactly one entry"
                )
        prev = (v, doc)

    # 3. disk == manifest
    on_disk = {nm for nm in os.listdir(index_dir) if nm.startswith("batch_")}
    committed_names = {d["name"] for d in batch_dirs}
    if committed_names - on_disk:
        failures.append(
            f"committed dirs missing from disk: {sorted(committed_names - on_disk)[:5]}"
        )
    stray = on_disk - committed_names
    if len(stray) > n_loud:  # loud failures legitimately strand their dir
        failures.append(f"stray uncommitted dirs beyond loud failures: "
                        f"{sorted(stray)[:5]}")
    tmp_debris = [nm for nm in os.listdir(index_dir)
                  if nm.startswith(".batch_")]
    if tmp_debris:
        failures.append(f".batch_ tmp debris: {tmp_debris[:5]}")

    # 4. reader monotonicity
    if reader_doc["errors"]:
        failures.append(f"reader exceptions: {reader_doc['errors'][:3]}")
    s = reader_doc["series"]
    for a, b in zip(s, s[1:]):
        if b[0] < a[0] or b[1] < a[1]:
            failures.append(f"reader saw regression {a} -> {b}")
            break

    verdict = {
        "procs": procs,
        "commits_per_proc": commits,
        "attempts": len(outcomes),
        "committed": n_committed,
        "lost_to_twin_or_skipped": n_lost,
        "loud_failures": n_loud,
        "shared_tokens": len(shared_tokens),
        "unique_tokens": len(uniq),
        "head_version": int(head.get("version", 0)),
        "reader_polls": len(s),
        "wall_s": round(wall, 1),
        "failures": failures,
        "ok": not failures,
    }
    if not failures:
        shutil.rmtree(base, ignore_errors=True)
    else:
        verdict["store_kept_at"] = base
    return verdict


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    commits = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    share = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    v = run_probe(procs, commits, share)
    print(f"\n=== ANN store multi-PROCESS commit probe (spawn) ===")
    print(f"{v['procs']} processes x {v['commits_per_proc']} commits "
          f"({v['shared_tokens']} twin tokens), wall {v['wall_s']}s")
    print(f"committed: {v['committed']}   lost-to-twin/skipped: "
          f"{v['lost_to_twin_or_skipped']}   loud: {v['loud_failures']}")
    print(f"head version: {v['head_version']}   reader polls: "
          f"{v['reader_polls']} (clean)")
    for f in v["failures"]:
        print(f"FAILURE: {f}")
    print("PASS" if v["ok"] else f"FAIL (store kept at {v.get('store_kept_at')})")
    if not v["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
