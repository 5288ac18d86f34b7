"""Diff two bench artifacts query-by-query (VERDICT r13 #5): make the
round-over-round arbitration one command instead of a by-hand JSON read.

    python tools/bench_trend.py OLD.json NEW.json [--threshold 0.20]

Accepts either artifact shape and any mix of the two:
  - isolated-suite files (tools/bench_isolated.py --suite):
    {"queries": {name: {"warm_median": s, ...}}, "total_warm_median": s,
     "errors": [...]}
  - driver / bench.py files: {"queries": {name: s}, "value": s}

Prints per-query old/new/delta rows sorted by |drift|, flagging drifts
past the threshold (default ±20% — the documented host-noise band at the
~1s query scale; see SCALE.md "Bench variance audit": a drift inside the
band on untouched code is environment, and even past-band drifts are
arbitrated by the ISOLATED series, not the shared-session one). Also
reports queries present on only one side and either side's error rows, so
a partial run can never read as a speedup. Exit code is 0 on a successful
diff — this is an arbitration aid, not a gate; the gates are correctness
and the suite total. Pass --gate (VERDICT r14) to make it one anyway:
exit 1 when either side carries error rows, the TOTAL drifts slower
past the threshold, either side lacks a TOTAL (a partial run the gate
cannot arbitrate), or queries vanished from the new side (a truncated
run would otherwise read as a speedup) — so round automation can
consume the verdict without parsing stdout. Default (no --gate)
behavior is unchanged, with one deliberate exception shared by both
modes: a non-FINITE timing (NaN/inf — float() parses them, and NaN
poisons every later comparison) refuses at load like any other
non-numeric value, where it previously flowed through.

--weather (VERDICT r15 #3) reads each artifact's embedded host-probe
dicts (host / host_after — every BENCH_* artifact carries them since
r15) and judges them against the SCALE.md healthy envelope via
host_probe.weather_ok — the thresholds live in tools/host_probe.py
beside the instrument, not here — PLUS the artifact's own intra-run
warm dispersion (the probes bracket the run; the per-query warm lists
record its middle, where an r16 reject hid a +142% stall between two
in-envelope probes). Alone it ANNOTATES: one `# weather` line per probe
and per side's dispersion, exit code unchanged. Combined with --gate it
GATES: an artifact measured outside the envelope (or missing its
probes/warm lists) fails the run, so weather-tainted timings can never
silently win an arbitration — the loop VERDICT r15 "What's wrong #1/#2"
asked to close.

The in-run stage channel (queries_stage_weather, r17) joins the gate in
r18: an artifact whose full-coverage cpu_over_run floor sits below
STAGE_FLOOR (calibrated 0.3 — clean gated windows floor >= 0.5,
mid-run collapses ~0.15) is tainted — the channel certifies the MIDDLE
of the run at stage granularity, where the bracketing probes and even
the dispersion verdict can miss a short collapse. Channel ABSENCE stays
advisory (the committed pre-r18 isolated series carries none); see the
STAGE_FLOOR note for the calibration anchors and the absence rationale.
"""

from __future__ import annotations

import importlib
import json
import os
import sys


def load(path: str) -> tuple[dict[str, float], float | None, list[str]]:
    """(per-query seconds, total, error-query names) from either shape."""
    doc, wrapper_rc = _read_doc(path)
    return _load_doc(doc, wrapper_rc, path)


def _load_doc(
    doc: object, wrapper_rc: object, path: str
) -> tuple[dict[str, float], float | None, list[str]]:
    if not isinstance(doc, dict) or not isinstance(doc.get("queries"), dict):
        raise SystemExit(
            f"{path!r} is not a bench artifact (no 'queries' map)"
        )
    qs: dict[str, float] = {}
    errors = [str(e) for e in doc.get("errors", [])]
    if wrapper_rc not in (None, 0):
        errors.append(f"(driver run exited rc={wrapper_rc})")
    for n, v in doc["queries"].items():
        if isinstance(v, dict):
            if "warm_median" in v:
                qs[n] = _coerce(v["warm_median"], path, n)
            elif n not in errors:  # error row not already in the list
                errors.append(n)
        else:
            qs[n] = _coerce(v, path, n)
    total = doc.get("total_warm_median", doc.get("value"))
    return qs, (_coerce(total, path, "TOTAL") if total is not None else None), sorted(errors)


def _coerce(v: object, path: str, query: str) -> float:
    """float(v) with the tool's refusal style: a non-numeric timing (e.g.
    "n/a" in a hand-edited or driver-degraded artifact) must exit cleanly
    naming the file and query, not raw-traceback (ADVICE r14)."""
    import math

    try:
        out = float(v)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        out = None
    # NaN/inf parse as floats but poison every later comparison — in the
    # gate, `nan > threshold` is False, which would PASS exactly the
    # degraded-artifact class this refusal exists for (review r15)
    if out is None or not math.isfinite(out):
        raise SystemExit(
            f"non-numeric timing for query {query!r} in {path!r}: {v!r}"
        )
    return out


def _read_doc(path: str) -> tuple[object, object]:
    """(payload, wrapper_rc): one artifact read + driver-wrapper unwrap
    shared by load(), load_weather() and dispersion_verdict() — the
    refusal style and the "parsed" handling must not drift between the
    three consumers. The driver's BENCH_rNN.json wraps the bench line
    under "parsed" and carries the run's exit code beside it: a failed
    run with a stale/partial parsed payload must surface, not diff as
    healthy (review r14) — only load() consumes the rc, the weather
    readers ignore it."""
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError) as e:
        raise SystemExit(f"cannot read bench artifact {path!r}: {e}")
    wrapper_rc = None
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        wrapper_rc = doc.get("rc")
        doc = doc["parsed"]
    return doc, wrapper_rc


def load_weather(path: str) -> dict:
    """The host-weather dicts embedded in a bench artifact: {"host": ...,
    "host_after": ...}, each a host_probe dict or None (probe degraded,
    or a pre-r15 artifact). Separate from load() so the timing contract
    (and its pins) stays untouched; same wrapper unwrap as load()."""
    return _weather_of(_read_doc(path)[0])


def _weather_of(doc: object) -> dict:
    if not isinstance(doc, dict):
        return {"host": None, "host_after": None}
    return {"host": doc.get("host"), "host_after": doc.get("host_after")}


# Intra-run warm-spread thresholds for the --weather dispersion verdict.
# The bracketing host probes are ~3 s snapshots around a multi-minute
# run — a mid-run stall can hide between them (seen in r16: an isolated
# suite at +142% vs the band with BOTH probes in envelope, while
# dsir_select's three warm runs read 13.98/12.39/5.56 s seconds apart
# on identical code). The warm-run lists inside the artifact record the
# run's own weather. Measured across the committed isolated artifacts:
# band runs (17.2-19.3 s totals, r13/r14/r15_start) have max spreads
# 1.46-1.53 with at most one query past 1.5; weather runs (27-42 s,
# r15_mid/r15_end3/the r16 reject) show 2-3 queries past 1.6 or a
# single one past 2.0. The verdict: >= DISPERSION_OUTLIERS queries with
# max(warm)/min(warm) > DISPERSION_SPREAD, or ANY query past
# DISPERSION_HARD, = mid-run weather.
DISPERSION_SPREAD = 1.6
DISPERSION_OUTLIERS = 2
DISPERSION_HARD = 2.0

# In-run stage-channel floor (r18 — VERDICT r17 #2 promoted the r17
# advisory channel to fail-closed). cpu_over_run collapses exactly
# under steal/fault regimes (threads descheduled while the task clock
# runs) and is window-width-independent. Calibration anchors, all
# committed artifacts: CLEAN gated windows floor 0.625
# (BENCH_SHARED_r17d), 0.500 (r17e), 0.595 (the r17 driver sidecar,
# BENCH_DETAIL.json); a MIDDLING window read 0.362 (uncommitted, r17
# notes); the r17f mid-run COLLAPSE read 0.151 (bm25 — the same query
# the dispersion check flagged). 0.3 splits clean (>= 0.5) from
# collapsed (~0.15) with ~1.7x margin each side. The ~0.36 middling
# regime deliberately PASSES this floor — the floor's job is catching
# in-run collapse the edge brackets miss, not window-quality grading
# (per-query floors wait for a wider anchor set; middling windows are
# policed by the brackets + dispersion + the band itself). ABSENCE of
# the channel stays advisory, unlike the probe/dispersion channels:
# it shipped in bench.py's shared/driver path in r17 and in the
# isolated suite in r18 (each child fetches its OWN app's rollup), so
# pre-r18 isolated artifacts — including the whole committed arbiter
# series this gate compares against — and pre-r17 shared artifacts
# carry none; failing closed on absence would invalidate every one of
# those comparisons. PRESENT-but-empty (every rollup partial/None) is
# a degraded measurement and fails closed like a missing probe.
STAGE_FLOOR = 0.3


def full_coverage_ratio(sw: object) -> float | None:
    """The one classification of a stage rollup as USABLE for the
    floor: a dict with no `incomplete` marker (partial coverage must
    not feed the gate — review r17 pass 7) whose cpu_over_run is a
    finite non-bool number (NaN/inf/True would pass comparisons
    silently or mint fake floors). Shared by _stage_weather_of and
    bench_ab's per-run annotation (review r18 pass 5: two verbatim
    copies of this predicate would diverge at the next tightening).
    Returns the ratio, or None for anything else."""
    import math

    if not isinstance(sw, dict) or "incomplete" in sw:
        return None
    v = sw.get("cpu_over_run")
    if (
        isinstance(v, (int, float))
        and not isinstance(v, bool)
        and math.isfinite(v)
    ):
        return float(v)
    return None


def _stage_weather_of(doc: object) -> dict | None:
    """The artifact's per-query in-run stage rollups
    (`queries_stage_weather`, r17 — executor CPU vs wall over each
    query's stages, the channel that certifies window quality ACROSS
    the run), split by coverage: {"range": sorted (cpu_over_run, query)
    pairs with FULL coverage, "partial": queries whose rollup carries
    an `incomplete` marker (stages still ACTIVE at fetch — their ratio
    covers a subset of the query's stages and must not feed the gating
    floor; review r17 pass 7) or whose rollup is None/unusable (the
    REST fetch failed or every stage dropped out of the window —
    unmeasured for that query)}. None ONLY when the artifact does not
    carry the channel key at all (pre-r17 / isolated series). The key
    being PRESENT — whatever its value — always yields a dict, so the
    STAGE_FLOOR gate can fail closed on a channel that exists but
    proves nothing: a mid-collapse REST timeout writes {q: None, ...},
    which must read as a degraded measurement, never as 'channel
    absent' (review r18 pass 1 — the fail-open shape). Since r18 the
    floor GATES under --weather --gate; see STAGE_FLOOR."""
    if not isinstance(doc, dict) or "queries_stage_weather" not in doc:
        return None
    sw = doc.get("queries_stage_weather")
    if not isinstance(sw, dict):
        return {"range": [], "partial": []}
    full: list = []
    partial: list = []
    for q, v in sw.items():
        r = full_coverage_ratio(v)
        if r is not None:
            full.append((r, str(q)))
        else:
            partial.append(str(q))
    return {"range": sorted(full), "partial": sorted(partial)}


def dispersion_verdict(path: str) -> tuple[bool, list[str]]:
    """(ok, reasons) for the artifact's intra-run warm dispersion.
    Warm lists come from isolated-suite rows ({"warm": [...]}) or the
    driver/bench shape's top-level "queries_warm" map (r16+). No warm
    data at all is NOT ok — same fail-closed rule as a missing host
    probe: weather that cannot be checked must not pass by omission
    (pre-r16 driver artifacts land here, alongside their probe-less or
    tainted host keys)."""
    return _dispersion_of(_read_doc(path)[0])


def _dispersion_of(doc: object) -> tuple[bool, list[str]]:
    import math

    def _spread(w: object) -> float | None:
        # a list with any non-numeric / non-finite / non-positive entry
        # yields no spread rather than a TypeError (mixed types crash
        # max/min) or a silent pass (NaN compares False against every
        # threshold — the same poisoning _coerce refuses for timings)
        if (
            isinstance(w, list)
            and len(w) >= 2
            and all(
                isinstance(x, (int, float))
                and not isinstance(x, bool)
                and math.isfinite(x)
                and x > 0
                for x in w
            )
        ):
            return max(w) / min(w)
        return None

    spreads: dict[str, float] = {}
    timed: set[str] = set()
    if isinstance(doc, dict):
        rows = doc.get("queries")
        if isinstance(rows, dict):
            timed = set(rows)
            for n, v in rows.items():
                if isinstance(v, dict):
                    s = _spread(v.get("warm"))
                    if s is not None:
                        spreads[n] = s
        wr = doc.get("queries_warm")
        if isinstance(wr, dict):
            for n, w in wr.items():
                s = _spread(w)
                if s is not None:
                    spreads[n] = s
    if not spreads:
        return False, ["no warm-run lists — dispersion unmeasurable"]
    reasons = []
    # EVERY timed query needs a usable warm list — an artifact proving
    # dispersion for 1 of 18 queries could hide the mid-run stall in
    # the 17 unprovable ones, passing by omission (review r16 pass 5;
    # the same fail-closed rule the missing-probe case follows). Warm
    # lists for names outside the timing map are extra data, not
    # coverage.
    uncovered = sorted(timed - set(spreads))
    if uncovered:
        reasons.append(
            f"dispersion unmeasurable for {len(uncovered)} timed "
            f"queries (missing/poisoned warm lists): {uncovered[:5]}"
        )
    outliers = {n: s for n, s in spreads.items() if s > DISPERSION_SPREAD}
    hard = {n: s for n, s in outliers.items() if s > DISPERSION_HARD}
    if hard or len(outliers) >= DISPERSION_OUTLIERS:
        reasons.append(
            "mid-run weather: warm-run spread "
            + ", ".join(f"{n} {s:.2f}x" for n, s in sorted(
                outliers.items(), key=lambda kv: -kv[1]))
        )
    return not reasons, reasons


def _host_probe_mod():
    """tools/host_probe — imported from THIS file's directory so the
    envelope verdict always comes from the instrument that defined it
    (the thresholds are deliberately not duplicated here)."""
    tools = os.path.dirname(os.path.abspath(__file__))
    if tools not in sys.path:
        sys.path.insert(0, tools)
    return importlib.import_module("host_probe")


def drift(old: float, new: float) -> float:
    """Fractional drift new-vs-old. Timings round to 3 decimals, so
    old == 0.0 is representable: unchanged-at-zero is 0% drift,
    grown-from-zero is inf (flagged slower) — one rule for per-query
    rows AND the TOTAL row (review r14), never a self-contradictory
    "(faster)" inf row."""
    if old:
        return (new - old) / old
    return 0.0 if new == old else float("inf")


def main() -> None:
    args = list(sys.argv[1:])
    threshold = 0.20
    gate = "--gate" in args
    if gate:
        args.remove("--gate")
    weather = "--weather" in args
    if weather:
        args.remove("--weather")
    if "--threshold" in args:
        i = args.index("--threshold")
        if i + 1 >= len(args):
            raise SystemExit("--threshold needs a fraction (e.g. 0.20)")
        try:
            threshold = float(args[i + 1])
        except ValueError:
            raise SystemExit(
                f"--threshold must be a fraction, got {args[i + 1]!r}"
            )
        del args[i : i + 2]
    if len(args) != 2:
        raise SystemExit(
            __doc__
            or "usage: bench_trend.py OLD.json NEW.json [--threshold 0.20]"
        )
    # ONE _read_doc per side for the WHOLE run — timings, host keys and
    # dispersion are all judged from the same in-memory snapshot, so an
    # artifact rewritten mid-gate can never mix one run's timings with
    # another's weather (review r16 x2: the first fix unified only the
    # two weather reads, leaving load()'s separate read in the window)
    old_doc, old_rc = _read_doc(args[0])
    new_doc, new_rc = _read_doc(args[1])
    old_qs, old_total, old_errs = _load_doc(old_doc, old_rc, args[0])
    new_qs, new_total, new_errs = _load_doc(new_doc, new_rc, args[1])

    shared = sorted(set(old_qs) & set(new_qs))
    rows = [
        (n, old_qs[n], new_qs[n], new_qs[n] - old_qs[n], drift(old_qs[n], new_qs[n]))
        for n in shared
    ]
    rows.sort(key=lambda r: -abs(r[4]))

    # floor of 5 so the 'query' header and 'TOTAL' row never overflow
    # their column even when every shared name is shorter (review r14)
    name_w = max([len(n) for n in shared] + [5])
    print(f"{'query':<{name_w}}  {'old':>8}  {'new':>8}  {'delta':>8}  {'drift':>7}")
    flagged = 0
    for n, o, w, d, pct in rows:
        flag = ""
        if abs(pct) > threshold:
            flagged += 1
            flag = "  <-- past band" if d > 0 else "  (faster)"
        print(f"{n:<{name_w}}  {o:>8.3f}  {w:>8.3f}  {d:>+8.3f}  {pct:>+6.1%}{flag}")

    total_drift = None
    if old_total is not None and new_total is not None:
        total_drift = drift(old_total, new_total)
        print(
            f"{'TOTAL':<{name_w}}  {old_total:>8.3f}  {new_total:>8.3f}  "
            f"{new_total - old_total:>+8.3f}  {total_drift:>+6.1%}"
        )
    for label, names in (
        ("only in old", sorted(set(old_qs) - set(new_qs))),
        ("only in new", sorted(set(new_qs) - set(old_qs))),
        ("errors in old", old_errs),
        ("errors in new", new_errs),
    ):
        if names:
            print(f"# {label}: {names}")
    slow = sum(1 for *_, pct in rows if pct > threshold)
    print(
        f"# {flagged} of {len(shared)} shared queries drifted past "
        f"±{threshold:.0%} ({slow} slower); drifts inside the band on "
        "untouched code are host noise — arbitrate past-band SLOWER rows "
        "with tools/bench_isolated.py before believing a regression"
    )
    tainted: list[str] = []
    if weather:
        hp = _host_probe_mod()
        for doc, side in ((old_doc, "old"), (new_doc, "new")):
            w = _weather_of(doc)
            for which in ("host", "host_after"):
                ok, why = hp.weather_ok(w[which])
                if ok:
                    print(f"# weather {side}/{which}: in envelope")
                else:
                    note = f"{side}/{which}: {'; '.join(why)}"
                    tainted.append(note)
                    print(f"# weather {note} — OUTSIDE envelope")
            # the probes bracket the run; the warm-run lists ARE the run
            ok, why = _dispersion_of(doc)
            if ok:
                print(f"# weather {side}/dispersion: warm spreads in band")
            else:
                note = f"{side}/dispersion: {'; '.join(why)}"
                tainted.append(note)
                print(f"# weather {note}")
            # in-run stage channel: fail-closed floor (r18, VERDICT
            # r17 #2) when the channel is PRESENT; absence stays
            # advisory — see the STAGE_FLOOR calibration note
            sw = _stage_weather_of(doc)
            if sw:
                rng = sw["range"]
                caveat = (
                    f"; partial coverage (excluded): {sw['partial']}"
                    if sw["partial"] else ""
                )
                if not rng:
                    note = (
                        f"{side}/stage: channel present but no "
                        f"full-coverage rollups — floor unmeasurable"
                        f"{caveat}"
                    )
                    tainted.append(note)
                    print(f"# weather {note}")
                elif rng[0][0] < STAGE_FLOOR:
                    note = (
                        f"{side}/stage: cpu_over_run floor {rng[0][0]} "
                        f"({rng[0][1]}) below {STAGE_FLOOR} — in-run "
                        f"collapse{caveat}"
                    )
                    tainted.append(note)
                    print(f"# weather {note}")
                else:
                    print(
                        f"# weather {side}/stage: cpu_over_run "
                        f"{rng[0][0]} ({rng[0][1]}) .. {rng[-1][0]} "
                        f"({rng[-1][1]}) — floor >= {STAGE_FLOOR}"
                        f"{caveat}"
                    )
            else:
                print(
                    f"# weather {side}/stage: channel absent "
                    "(advisory — pre-r18 isolated / pre-r17 shared "
                    "artifacts carry none)"
                )
        if tainted and not gate:
            print(
                "# weather advisory: at least one side was measured "
                "outside the healthy envelope — its timings arbitrate "
                "nothing (add --gate to fail on this)"
            )
    if gate:
        # gate verdict (VERDICT r14 #4): error rows on either side, or a
        # TOTAL that got SLOWER past the band, fail the run. Per-query
        # drift and faster totals stay advisory — the band is host noise
        # per-query but a past-band suite TOTAL regression is the one
        # signal worth breaking automation over.
        reasons = []
        if old_errs or new_errs:
            reasons.append(f"error rows (old={old_errs}, new={new_errs})")
        if total_drift is None:
            # an artifact without a TOTAL is a partial/degraded run — the
            # gate's main check can't run, so it must refuse, not pass
            # (review r15; the module contract: a partial run can never
            # read as healthy)
            sides = [p for p, t in ((args[0], old_total), (args[1], new_total))
                     if t is None]
            reasons.append(f"no TOTAL in {sides} — gate cannot arbitrate")
        elif total_drift > threshold:
            reasons.append(
                f"TOTAL slower past band ({total_drift:+.1%} > +{threshold:.0%})"
            )
        if tainted:
            # an artifact measured outside the envelope (or missing its
            # probes) cannot arbitrate — fail closed rather than let a
            # weather-flattered "speedup" or weather-slandered
            # "regression" drive a decision (VERDICT r15 #3)
            reasons.append(f"weather outside envelope: {tainted}")
        vanished = sorted(set(old_qs) - set(new_qs))
        if vanished:
            # queries that disappeared = the new run is partial; their
            # absence also deflates the new TOTAL, so passing on the
            # total alone would read a truncated run as a speedup
            reasons.append(f"queries vanished from new: {vanished}")
        if reasons:
            print(f"# GATE FAIL: {'; '.join(reasons)}")
            sys.exit(1)
        print("# GATE PASS")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        # piped into head/less and the reader closed first — not an error
        # for the advisory mode. In GATE mode the verdict may never have
        # printed (the table overflowed the reader before the gate ran),
        # so exiting 0 here would mask a GATE FAIL from automation that
        # consumes only the exit code (review r15): fail closed instead.
        sys.exit(1 if "--gate" in sys.argv[1:] else 0)
