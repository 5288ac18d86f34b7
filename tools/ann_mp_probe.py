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
recording every (version, n_dirs, n_tokens) it resolves and any
exception — on a hardlink-capable local fs a resolved head must always
be internally consistent, version and token-count monotone (dir count
too, in append-only mode).

COMPACTOR MODE (VERDICT r15 #1): pass COMPACTORS >= 1 and that many
extra spawn processes loop the REAL ann_index._compact_dirs — the
actual compaction dance (grace sweep, fold, rename, rival-loss merge
guard, committed-vs-lost resolution), with a plain-text concatenation
injected where ann_index_compact injects the Spark parquet union — for
the probe's whole duration. The manifest-rewriting path is exactly the
seam whose cross-process interleavings (independent fs handles
mid-rewrite, a reader resolving across the fold, two compactors racing
each other AND the appender pack) the in-process battery cannot see.
With >= 2 compactors the r16 rival-compact guard is under test: a fold
whose inputs a rival already folded must abort and delete its own
output, never commit a duplicate. A rival's grace sweep can also delete
an input dir mid-union — that crash is LOUD (nothing committed, tmp
removed) and counted as fold_crash, not a failure.

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
  2. HEAD CHAIN: every retained manifest.v{n} parses with version == its
     filename, store_id constant, no version file above the head, no
     token appears twice WITHIN any version. Append-only mode adds the
     strict linear form: head.version == len(head.dirs), consecutive
     retained versions differ by exactly the one appended entry (strict
     superset, +1). Compactor mode replaces those two (folds shrink
     dirs) with TOKEN CONSERVATION: between consecutive retained
     versions no token ever disappears, at most one (the appended one)
     arrives, and every dir name that leaves `dirs` lands in the next
     version's superseded ledger — a fold may reshape the store but can
     neither lose nor duplicate a committed batch.
  3. DISK == MANIFEST (+ CONTENT): every committed entry's dir exists;
     every losing twin's dir was deleted; stray batch_*/.batch_* debris
     is bounded by loud failures (append louds + compactor louds — a
     loud strands exactly one unreferenced dir; expected zero at suite
     scale). In compactor mode the parent also reads every head dir's
     part files and checks the CONTENT: the multiset of `wid:tok` lines
     reaching the head equals the head's token set exactly — folding
     preserved every winner's rows, byte-level, with no duplicates.
  4. READER: no exceptions, version and n_tokens series monotone
     nondecreasing (n_dirs too in append-only mode — folds legitimately
     shrink it otherwise).

Run:  python tools/ann_mp_probe.py [PROCS] [COMMITS_PER_PROC] [SHARE_FRAC] [COMPACTORS]
Defaults 8 x 24, 25% shared tokens, 0 compactors. Escalate PROCS (and
COMPACTORS) until it breaks or the safety argument is airtight
(ROUND_NOTES trap 20 / the r8 probe standard — this same escalation
found the verify-tripwire losing 2/48).
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


def _attempt_commit(index_dir: str, fs, wid: int, tok: str) -> dict:
    """One token through ann_index_append's exact commit sequence minus
    the Spark encode: up-front replay scan (the fast no-op path) ->
    mktempdir -> write content -> rename -> _commit_manifest_entry.
    Returns the outcome record. Shared by _worker and the deterministic
    rival-compact tests (tests/test_ann_index.py), so both pin the SAME
    sequence — a drift between them would make the deterministic pins
    prove a different dance than the cross-process probe races."""
    from schemamap_spark.operators import ann_index as ai

    committed = set()
    for d in ai._load_manifest(index_dir, fs)["dirs"]:
        committed.update(_entry_tokens(d))
    if tok in committed:
        return {"token": tok, "outcome": "skipped-upfront"}
    tmp_dir = fs.mktempdir(index_dir, ".batch_")
    fs.write_text(os.path.join(tmp_dir, "part-00000"), f"{wid}:{tok}\n")
    final_name = "batch_" + os.path.basename(tmp_dir)[len(".batch_"):]
    fs.rename(tmp_dir, os.path.join(index_dir, final_name))
    entry = {"name": final_name, "occupancy": {}, "batch_token": tok}
    ok = ai._commit_manifest_entry(index_dir, entry, fs)
    return {
        "token": tok,
        "name": final_name,
        "outcome": "committed" if ok else "lost-to-twin",
    }


# every compactor counter, in one place: the child dict, the parent's
# aggregate init, and the aggregation loop all build from this tuple, so
# a new counter added to one site cannot silently vanish from the
# verdict through doc.get(k, 0) (review r16)
_COMPACTOR_COUNTERS = (
    "attempts", "cycles", "folded", "noop", "lost_to_rival", "loud",
    "loud_stranded", "fold_crash",
)


class _FoldReadRace(Exception):
    """Raised by make_text_fold when READING an input dir fails — the
    rival-grace-sweep race, the one OSError that is a documented
    multi-compactor outcome. Any other OSError (rename, manifest claim,
    the fold's own output write) must NOT be absorbed into this class:
    it would misfile a real commit-path I/O fault as the benign race
    and strand an unexplained dir for invariant 3 (review r16)."""


def make_text_fold(fs):
    """The probe's injected fold: concatenate every part file of every
    input batch dir (workers write one `wid:tok` line per commit).
    Module-level and shared with the deterministic tests so both pin
    one fold implementation."""

    def fold(paths: list, tmp_dir: str) -> None:
        parts = []
        try:
            for p in paths:
                for nm in sorted(fs.listdir(p)):
                    parts.append(fs.read_text(os.path.join(p, nm)))
        except OSError as e:
            raise _FoldReadRace(str(e)) from e
        fs.write_text(os.path.join(tmp_dir, "part-00000"), "".join(parts))

    return fold


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
            out.append(_attempt_commit(index_dir, fs, wid, tok))
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


def _entry_tokens(d: dict) -> list:
    """Delegate to ann_index._entry_tokens — the store's ONE definition
    of token carriage (review r16): the probe's invariants must extract
    tokens exactly the way the store does, or a token-shape change
    would leave them verifying different semantics. Lazy import keeps
    the module importable before sys.path setup in spawn children."""
    from schemamap_spark.operators import ann_index as ai

    return ai._entry_tokens(d)


def _reader(index_dir: str, results_dir: str, stop_path: str) -> None:
    """Poll _load_manifest until the stop sentinel appears: every
    resolved head must parse (the retry loop owns in-flight races);
    version and token-count can never go backwards (dirs-count neither,
    in append-only mode — the parent knows which mode it ran)."""
    from schemamap_spark.operators import ann_index as ai
    from schemamap_spark.sources import fscommit

    fs = fscommit.fs_for(index_dir)
    series, errors = [], []
    while not os.path.exists(stop_path):
        try:
            m = ai._load_manifest(index_dir, fs)
            series.append([
                int(m.get("version", 0)),
                len(m["dirs"]),
                sum(len(_entry_tokens(d)) for d in m["dirs"]),
            ])
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


def _compactor(
    index_dir: str, results_dir: str, cid: int, stop_path: str
) -> None:
    """One compactor process: loop the REAL compaction dance
    (ann_index._compact_dirs — grace sweep, fold, rename, rival-loss
    merge guard, committed-vs-lost resolution) with a text concatenation
    injected where ann_index_compact injects the Spark parquet union,
    until the stop sentinel. Every cycle outcome lands in c{cid}.json."""
    from schemamap_spark.operators import ann_index as ai
    from schemamap_spark.sources import fscommit

    fs = fscommit.fs_for(index_dir)
    base_fold = make_text_fold(fs)
    # a loud failure strands a renamed dir ONLY when the fold (and so
    # the rename right after it) actually ran this pass — a loud from
    # the pass-start manifest read stranded nothing, and counting it
    # toward the stray allowance would loosen invariant 3 by one dir
    # per such loud (review r16)
    fold_ran = [False]

    def fold(paths: list, tmp_dir: str) -> None:
        fold_ran[0] = True
        base_fold(paths, tmp_dir)

    # the probe races _compact_dirs_once, the primitive, NOT the public
    # retry wrapper: the wrapper's internal retry would fold the rival
    # losses it exists to survive into an opaque success, and the
    # probe's whole point is counting every guard firing. The wrapper
    # is a trivial bounded loop over this primitive, pinned separately
    # by the deterministic retry test in tests/test_ann_index.py.
    # attempts counts every loop iteration; cycles only the ones where
    # _compact_dirs_once returned (clean path) — so the printed
    # breakdown sums: attempts == cycles + loud + fold_crash + bugs
    # (review r16: the old wording made louds look unaccounted-for)
    out = {**{k: 0 for k in _COMPACTOR_COUNTERS}, "bugs": []}
    while not os.path.exists(stop_path):
        out["attempts"] += 1
        fold_ran[0] = False
        try:
            # min_sweep_age=0: the probe EXISTS to race the sweep-vs-
            # merge interleavings — with the production age gate
            # (MIN_SWEEP_AGE_S) a seconds-long probe run would never
            # sweep its freshly-stamped grace dirs and the rival-sweep
            # fold crash (_FoldReadRace) plus the ghost-ledger dance
            # would go unexercised (review r17). The gate itself is
            # pinned by deterministic unit tests, not by this probe.
            n = ai._compact_dirs_once(
                index_dir, fs, fold, grace=True, min_sweep_age=0,
            )
            out["cycles"] += 1
            if n is None:
                # the rival-compact guard fired: fold lost, own output
                # deleted — counted so escalation runs prove the guard
                # is actually exercised across processes, not just
                # present
                out["lost_to_rival"] += 1
            elif n == 0:
                out["noop"] += 1
            else:
                out["folded"] += n
        except ai.ConcurrentWriteError:
            # relief valve: nothing committed; the renamed dir is
            # stranded only if the pass got as far as the fold+rename
            out["loud"] += 1
            if fold_ran[0]:
                out["loud_stranded"] += 1
        except (KeyboardInterrupt, SystemExit):
            raise  # operator signal, same contract as the worker/reader
        except _FoldReadRace:
            # a RIVAL compactor's grace sweep deleted one of our input
            # dirs between the manifest read and the fold's read — the
            # union crashes loudly, nothing committed, tmp removed by
            # _compact_dirs_once's fold guard. A documented
            # multi-compactor race, not a commit-log bug; counted so the
            # verdict shows it. ONLY the fold's input reads raise this
            # class — a rename/claim/output-write OSError lands in bugs
            # below, where its text survives for the investigation
            # (review r16)
            out["fold_crash"] += 1
        except Exception as e:  # any OTHER escape is a bug: record it
            out["bugs"].append(f"{type(e).__name__}: {e}")
        time.sleep(0.003)
    with open(os.path.join(results_dir, f"c{cid}.json"), "w") as f:
        json.dump(out, f)


def run_probe(
    procs: int = 8,
    commits: int = 24,
    share_frac: float = 0.25,
    base: str | None = None,
    compactors: int = 0,
) -> dict:
    """Drive the probe and return the verdict dict (importable by pytest;
    __main__ prints and exits on it). Token plan: worker w owns `commits`
    tokens, of which the last n_shared = max(1, round(share_frac *
    commits)) are its SHARED slice; each worker additionally attempts
    worker (w+1) % procs's shared slice, so every shared token has
    exactly two contenders in different processes and every worker makes
    commits + n_shared attempts (the verdict's `attempts` field counts
    these, not procs x commits). `compactors` spawn processes loop the
    real _compact_dirs against the same store for the run's duration —
    see the module docstring's COMPACTOR MODE."""
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
    compactor_procs = [
        ctx.Process(target=_compactor, args=(index_dir, results_dir, c, stop_path))
        for c in range(compactors)
    ]
    t0 = time.monotonic()
    # the finally owns child cleanup: without it, an interrupt during the
    # join loop never writes the stop sentinel and the reader (and any
    # compactors) spin at ms-scale polls forever, orphaned across
    # interrupted runs (review r15)
    try:
        reader.start()
        for p in compactor_procs:
            p.start()
        for p in workers:
            p.start()
        for p in workers:
            p.join()
    finally:
        open(stop_path, "w").close()
        reader.join(timeout=30)
        for p in compactor_procs:
            # a compactor finishes its in-flight dance after the sentinel;
            # local fs cycles are ms-scale, so 30s means something hung
            p.join(timeout=30)
        for p in workers + compactor_procs + [reader]:
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
        # missing/unreadable = the worker died before writing (spawn
        # import failure, OOM before dump) or its file cannot be opened
        # (any OSError — PermissionError, IsADirectoryError — counts as
        # died-without-results too, ADVICE r15); truncated/unparseable =
        # it died MID-write or a serialization bug — distinct failure
        # messages so an investigation starts from the right theory, and
        # none crashes the battery (review r15 x3: same ladder as
        # reader.json)
        try:
            outcomes.extend(json.load(open(path)))
        except OSError:
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
    except OSError:
        # FileNotFoundError and any other open() failure alike (ADVICE
        # r15): the reader's results are unavailable either way, and a
        # PermissionError must fail invariant 4, not crash the battery
        reader_doc = {"series": [], "errors": ["reader died without results"]}
    except ValueError:
        # the join-timeout terminate() can SIGTERM the reader MID-WRITE
        # (review r15): a truncated reader.json must fail invariant 4
        # like a missing one, not crash the battery with a JSONDecodeError
        reader_doc = {"series": [], "errors": ["reader results truncated"]}

    # compactor results ride the same died-without-results ladder
    compactor_stats = {**{k: 0 for k in _COMPACTOR_COUNTERS}, "bugs": []}
    missing_compactors = []
    for c in range(compactors):
        try:
            doc = json.load(open(os.path.join(results_dir, f"c{c}.json")))
        except (OSError, ValueError):
            missing_compactors.append(c)
            continue
        for k in _COMPACTOR_COUNTERS:
            compactor_stats[k] += doc.get(k, 0)
        compactor_stats["bugs"].extend(doc.get("bugs", ()))

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
    if missing_compactors:
        failures.append(
            f"compactors died without results: {missing_compactors}"
        )
    if compactor_stats["bugs"]:
        failures.append(
            f"compactor non-loud escapes: {compactor_stats['bugs'][:3]}"
        )

    # 1. exactly-once per token, commit-or-loud — counting tokens through
    # FOLDS: an uncompacted append carries batch_token, a fold carries
    # every absorbed token in batch_tokens; a token appearing twice in
    # the head (in any mix of the two) is a duplicate the exactly-once
    # contract forbids
    by_token: dict[str, int] = {}
    for d in batch_dirs:
        for t in _entry_tokens(d):
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

    # 2. head chain over the retained window — strict linear form in
    # append-only mode; token-conservation form when compactors run
    # (folds legitimately shrink `dirs`, so version != len(dirs) there)
    if not compactors and int(head.get("version", 0)) != len(head["dirs"]):
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
        toks_v = [t for d in doc["dirs"] for t in _entry_tokens(d)]
        if len(set(toks_v)) != len(toks_v):
            failures.append(f"v{v} carries a token more than once")
        if not compactors and len(doc["dirs"]) != v:
            failures.append(f"v{v} has {len(doc['dirs'])} dirs, expected {v}")
        if prev is not None and prev[0] == v - 1:
            names_prev = {d["name"] for d in prev[1]["dirs"]}
            names_v = {d["name"] for d in doc["dirs"]}
            if not compactors:
                if not (names_prev < names_v and len(names_v - names_prev) == 1):
                    failures.append(
                        f"v{v} does not extend v{v - 1} by exactly one entry"
                    )
            else:
                # TOKEN CONSERVATION across every commit: nothing ever
                # disappears, at most the one appended token arrives,
                # and any dir folded out of `dirs` is accounted for in
                # the successor's superseded ledger
                t_prev = {t for d in prev[1]["dirs"] for t in _entry_tokens(d)}
                if t_prev - set(toks_v):
                    failures.append(
                        f"tokens LOST v{v - 1}->v{v}: "
                        f"{sorted(t_prev - set(toks_v))[:5]}"
                    )
                if len(set(toks_v) - t_prev) > 1:
                    failures.append(
                        f"v{v} added {len(set(toks_v) - t_prev)} tokens in "
                        "one commit (appends add exactly one)"
                    )
                removed = names_prev - names_v
                if removed and not removed <= set(doc.get("superseded", [])):
                    failures.append(
                        f"v{v} dropped dirs without superseding them: "
                        f"{sorted(removed - set(doc.get('superseded', [])))[:5]}"
                    )
        prev = (v, doc)

    # 3. disk == manifest (+ content through folds)
    on_disk = {nm for nm in os.listdir(index_dir) if nm.startswith("batch_")}
    committed_names = {d["name"] for d in batch_dirs}
    if committed_names - on_disk:
        failures.append(
            f"committed dirs missing from disk: {sorted(committed_names - on_disk)[:5]}"
        )
    # loud failures legitimately strand their renamed dir (append and
    # compactor alike); superseded grace copies are ledgered, not stray
    stray = (on_disk - committed_names) - set(head.get("superseded", []))
    # worker louds always strand (their loud fires after the rename);
    # compactor louds only when the pass reached its fold+rename
    allowed_strays = n_loud + compactor_stats["loud_stranded"]
    if len(stray) > allowed_strays:
        failures.append(f"stray uncommitted dirs beyond loud failures: "
                        f"{sorted(stray)[:5]}")
    tmp_debris = [nm for nm in os.listdir(index_dir)
                  if nm.startswith(".batch_")]
    if tmp_debris:
        failures.append(f".batch_ tmp debris: {tmp_debris[:5]}")
    if compactors:
        # CONTENT survives folding: every committed `wid:tok` line must
        # reach the head through any number of folds, exactly once —
        # token accounting (invariant 1) proves the manifest, this
        # proves the bytes the manifest points at
        content_tokens: dict[str, int] = {}
        unreadable_dirs: list[str] = []
        for d in batch_dirs:
            p = os.path.join(index_dir, d["name"])
            # never-crash ladder, same as every other gather path: a
            # committed dir missing from disk is THE corruption this
            # check exists to surface — it must land in `failures` (the
            # disk==manifest check above already named it), not raise
            # FileNotFoundError out of run_probe and lose the whole
            # verdict (review r16)
            try:
                names = sorted(os.listdir(p))
            except OSError:
                unreadable_dirs.append(d["name"])
                continue
            for nm in names:
                try:
                    with open(os.path.join(p, nm)) as fh:
                        for line in fh:
                            if line.strip():
                                t = line.strip().split(":", 1)[1]
                                content_tokens[t] = content_tokens.get(t, 0) + 1
                except OSError:
                    unreadable_dirs.append(f"{d['name']}/{nm}")
        if unreadable_dirs:
            failures.append(
                f"content check could not read committed dirs/files: "
                f"{unreadable_dirs[:5]}"
            )
        if content_tokens != {t: 1 for t in by_token}:
            lost_rows = set(by_token) - set(content_tokens)
            duped_rows = {t: c for t, c in content_tokens.items() if c != 1}
            extra_rows = set(content_tokens) - set(by_token)
            failures.append(
                f"folded CONTENT diverged from manifest: lost rows "
                f"{sorted(lost_rows)[:5]}, duplicated {dict(list(duped_rows.items())[:5])}, "
                f"unreferenced {sorted(extra_rows)[:5]}"
            )

    # 4. reader monotonicity: version and token-count never regress;
    # dirs-count only in append-only mode (folds shrink it by design)
    if reader_doc["errors"]:
        failures.append(f"reader exceptions: {reader_doc['errors'][:3]}")
    s = reader_doc["series"]
    for a, b in zip(s, s[1:]):
        if b[0] < a[0] or b[2] < a[2] or (not compactors and b[1] < a[1]):
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
        "head_dirs": len(batch_dirs),
        "reader_polls": len(s),
        "compactors": compactors,
        "compactor_stats": compactor_stats if compactors else None,
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
    compactors = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    v = run_probe(procs, commits, share, compactors=compactors)
    print(f"\n=== ANN store multi-PROCESS commit probe (spawn) ===")
    print(f"{v['procs']} writer processes x {v['commits_per_proc']} commits "
          f"({v['shared_tokens']} twin tokens), {v['compactors']} "
          f"compactor(s), wall {v['wall_s']}s")
    print(f"committed: {v['committed']}   lost-to-twin/skipped: "
          f"{v['lost_to_twin_or_skipped']}   loud: {v['loud_failures']}")
    print(f"head version: {v['head_version']}   head batch dirs: "
          f"{v['head_dirs']}   reader polls: {v['reader_polls']} (clean)")
    if v["compactor_stats"]:
        cs = v["compactor_stats"]
        print(f"compactors: {cs['attempts']} attempts = {cs['cycles']} "
              f"clean ({cs['folded']} dirs folded, {cs['noop']} no-op, "
              f"{cs['lost_to_rival']} lost-to-rival) + {cs['loud']} loud "
              f"+ {cs['fold_crash']} fold-read races + {len(cs['bugs'])} "
              f"bugs {cs['bugs'][:3]}")
    for f in v["failures"]:
        print(f"FAILURE: {f}")
    print("PASS" if v["ok"] else f"FAIL (store kept at {v.get('store_kept_at')})")
    if not v["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
