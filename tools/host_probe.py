"""Host-condition probe: measure the MACHINE so bench drift on untouched
code can be arbitrated mechanically instead of by narrative.

Three rounds (r12-r14) of bench-series adjudication kept landing on "host
wander" — scattered two-direction per-query drift, same-hour re-runs back
in band — and VERDICT r14 #3 asked for the isolated-vs-shared direction
disagreement to be "explained or dissolved". Round 15 caught the mechanism
live, twice, in different costumes within 20 minutes on identical code:

  02:35  first-touch writes to fresh anonymous memory at 0.2 GB/s while
         re-writes to the same (resident) pages ran 8.6 GB/s — a ~40x
         page-fault stall (~38 us/page vs healthy ~1 us); cache-resident
         sha256 meanwhile at full speed on all 32 cores. Isolated suite
         on identical code: 17.2 s (round start) -> 28.0 s.
  02:40  a 6 s saturation burst recorded 25.3% STEAL time with 68% idle
         and 32 runnable threads — the hypervisor descheduling vCPUs;
         aggregate compute fell ~4x. Container-side signals (loadavg,
         PSI, free memory) all read healthy throughout.

Both costumes are invisible to container-side load metrics and both hit
Spark asymmetrically: JVM startup, heap growth, shuffle buffers and Arrow
batches are first-touch-fault-bound; stage throughput is aggregate-CPU
bound. A cache-resident single-core microbenchmark — the natural "is the
host ok?" check — stays GREEN through both, which is why bench wander kept
surviving adjudication rounds. This probe separates the regimes in ~3-10 s:

  cpu_single_gb_s    sha256 over a cache-resident 1 MiB buffer, one core
                     (pure compute; immune to both failure modes)
  cpu_parallel_gb_s  aggregate streaming-sha256 rate, one thread per CPU
                     (hashlib releases the GIL above 2 KiB updates);
                     with cpu_parallel_scale = parallel/single
  steal_pct          steal share of /proc/stat ticks ACROSS the parallel
                     burst — nonzero only while we want CPU and the
                     hypervisor gives it to someone else
  first_touch_gb_s   median fill rate of FRESH size_mb-MiB numpy arrays
                     (each a new >mmap-threshold allocation, every write
                     faults a new page) — the Spark-relevant memory number
  warm_write_gb_s    re-fill rate of the same, now-resident, pages
                     (pure write bandwidth)
  fault_us_per_page  derived: (first-touch - bandwidth) cost per 4 KiB page
  first_touch_min/max_gb_s   per-round spread — the stall is BURSTY; a
                     healthy median with a pathological min is still weather

Verdicts (evidence beside the timings; nothing gates on them):
  page_fault_stalled  first-touch > STALL_FACTOR (8) x slower than warm
                      writes — healthy hosts show 2-4x (fault + zeroing),
                      the observed pathology ~40x
  cpu_capped          parallel scale below a quarter of the BURST WIDTH
                      (`workers`, capped at 32 — NOT `cpus`: on a wider
                      host the burst never asks for more than 32 cores,
                      so scale is judged against what it asked for), or
                      steal above 10% — an idle healthy host scales near
                      the burst width and steals ~0 (ADVICE r15)

Run it BESIDE benches (before/after), never DURING one — the saturation
burst would measure (and add to) the bench's own load.

Usage:
    python tools/host_probe.py [--size-mb N]     # one JSON line on stdout
Library:
    from host_probe import probe;  probe() -> dict

bench.py and bench_isolated.py --suite embed probe() output under "host"
keys in their artifacts (best-effort: a probe failure never fails a
bench), so every committed BENCH_* artifact carries the weather it was
measured under, and tools/bench_trend.py drift can be read against it.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

# first-touch slower than warm writes by more than this factor = stalled.
# Healthy linux: 2-4x (fault entry + page zeroing). Observed pathology:
# ~40x. The gap between the regimes is wide; 8 splits it conservatively.
STALL_FACTOR = 8.0

# parallel sha256 scale below nproc/4, or steal above 10%, = capped. The
# healthy host scales to ~0.8*nproc (measured 23-29 GB/s aggregate on 32
# cores); the observed pathology read 2.2-7.5 GB/s with 25% steal.
CAP_SCALE_DIVISOR = 4.0
CAP_STEAL_PCT = 10.0

# The HEALTHY ENVELOPE for arbitration-grade bench artifacts (VERDICT r15
# #3): an artifact whose embedded host keys fall outside these bounds was
# measured under weather and cannot arbitrate a code regression. The
# values are the SCALE.md round-15 audit's measured regime boundaries —
# the shared-session band (~13-14 s) and isolated band (~17.2 s) were
# only ever reproduced when all three held, on both the before AND after
# probes. Consumed by tools/bench_trend.py --weather; defined HERE so the
# thresholds cannot drift from the instrument that measures them.
ENVELOPE_FIRST_TOUCH_GB_S = 2.0  # healthy ~5-8; the stall pathology ~0.2
ENVELOPE_STEAL_PCT = 5.0         # healthy ~0; the capped pathology 25-31%
# scale is judged RELATIVE to the burst width the probe itself recorded
# (`workers`, like cpu_capped does) so the envelope doesn't deadlock the
# gate on narrower hosts where a healthy parallel scale can never reach
# the 32-wide rig's absolute 7 (review r16). Calibrated on the 32-wide
# rig: 7/32 — healthy reads 15-23 there (0.47-0.72), pathology 2.2-4.5
# (0.07-0.14).
ENVELOPE_SCALE_PER_WORKER = 7.0 / 32.0
ENVELOPE_SCALE = 7.0  # the 32-wide absolute form, kept for SCALE.md prose


def weather_ok(host: dict | None) -> tuple[bool, list[str]]:
    """Judge one embedded host-probe dict against the healthy envelope.

    Returns (ok, reasons). A MISSING probe (None — bench's best-effort
    contract degraded it) or missing/None keys are NOT ok: an artifact
    that cannot prove it was measured in the envelope doesn't get the
    benefit of the doubt — the whole point is that unprovable weather
    must not silently win an arbitration. steal_pct None (no /proc/stat)
    is the one documented-unmeasurable key: it fails too, loudly, so a
    platform without steal accounting shows up in the reasons rather
    than passing by omission."""
    if not isinstance(host, dict):
        return False, ["no host probe embedded"]
    reasons = []
    # the scale bound follows the probe's own burst width; a dict
    # without `workers` (hand-built, degraded) gets the 32-wide bound
    w = host.get("workers")
    width = w if isinstance(w, int) and not isinstance(w, bool) and w >= 1 else 32
    checks = (
        ("first_touch_gb_s", ENVELOPE_FIRST_TOUCH_GB_S, "ge"),
        ("steal_pct", ENVELOPE_STEAL_PCT, "le"),
        ("cpu_parallel_scale", ENVELOPE_SCALE_PER_WORKER * width, "ge"),
    )
    import math

    for key, bound, direction in checks:
        v = host.get(key)
        # bool is an int but not a measurement; NaN parses from json and
        # compares False against BOTH bounds — without the isfinite
        # refusal an all-NaN probe would read "in envelope" and the
        # fail-closed gate would fail OPEN (review r16)
        if (
            not isinstance(v, (int, float))
            or isinstance(v, bool)
            or not math.isfinite(v)
        ):
            reasons.append(f"{key} unmeasured ({v!r})")
        elif direction == "ge" and v < bound:
            reasons.append(f"{key} {v} < {bound}")
        elif direction == "le" and v > bound:
            reasons.append(f"{key} {v} > {bound}")
    return not reasons, reasons


# smallest size_mb whose repeat allocations are guaranteed fresh mmaps:
# glibc grows M_MMAP_THRESHOLD to the size of any freed mmap'd block,
# capped at 32 MiB — one constant shared by probe() and the CLI so the
# two guards can't drift (review r15 pass 4)
MIN_SIZE_MB = 33

_MB = 1 << 20


def _check_size(size_mb: int) -> None:
    """The one size-floor guard, shared by probe() and the CLI (so the
    two can't drift, and the CLI's catch stays TIGHT — wrapping the
    whole probe() run in except ValueError would rebrand unrelated
    deep-measurement ValueErrors as clean refusals; review r15 passes
    4+5)."""
    if size_mb < MIN_SIZE_MB:
        raise ValueError(
            f"size_mb={size_mb} is below the {MIN_SIZE_MB} MiB "
            "first-touch-safety floor: glibc's M_MMAP_THRESHOLD grows to "
            "freed-block size (capped at 32 MiB), so smaller repeat "
            "allocations recycle already-faulted heap pages and report "
            "warm writes as first-touch"
        )


def _cpu_single_gb_s(buf: bytes, reps: int) -> float:
    # streaming update form: one hasher, GIL released per >2 KiB update;
    # per-call sha256() construction would re-fetch the OpenSSL digest
    # and add lock traffic that is not the host's fault
    h = hashlib.sha256()
    t0 = time.monotonic()
    for _ in range(reps):
        h.update(buf)
    dt = time.monotonic() - t0
    h.digest()
    return (len(buf) * reps / _MB / 1024.0) / dt


def _stat_ticks() -> list[int] | None:
    """The aggregate cpu line of /proc/stat (user..steal), or None where
    the file is absent/odd (macOS, exotic containers) — steal is then
    reported as None rather than a fake 0."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts[0] != "cpu" or len(parts) < 9:
            return None
        return [int(x) for x in parts[1:9]]  # user..steal
    except (OSError, ValueError):
        return None


def _cpu_parallel(buf: bytes, seconds: float, workers: int) -> tuple[float, float | None]:
    """(aggregate GB/s, steal_pct) across a saturation burst.

    DEADLINE-based, not rep-counted (review r15): a fixed rep count
    spans ~80 ms on a healthy host — ~8 aggregate /proc/stat ticks of
    steal resolution, and short enough to land between the minute-scale
    steal bursts the probe exists to catch — while under a 15x cap the
    same reps would run for 15x the budget. Every worker hashes until
    the shared deadline, so the burst samples ~seconds of weather at
    ~100 ticks/core regardless of regime."""
    deadline = time.monotonic() + seconds

    def _burn(_: int) -> int:
        h = hashlib.sha256()
        n = 0
        while time.monotonic() < deadline:
            h.update(buf)
            n += 1
        h.digest()
        return n

    s0 = _stat_ticks()
    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        counts = list(ex.map(_burn, range(workers)))
    dt = time.monotonic() - t0
    s1 = _stat_ticks()
    gb_s = (len(buf) * sum(counts) / _MB / 1024.0) / dt
    steal = None
    if s0 is not None and s1 is not None:
        d = [b - a for a, b in zip(s0, s1)]
        tot = sum(d)
        if tot > 0:
            steal = 100.0 * d[7] / tot
    return gb_s, steal


def probe(size_mb: int = 256, rounds: int = 3, burst_s: float = 1.0) -> dict:
    """Measure the host; return a plain-JSON-able dict. ~2 s + burst_s
    healthy, ~10 s under a 40x fault stall (rounds x size_mb first-touch
    at 0.2 GB/s).

    size_mb below 33 MiB is REFUSED (ValueError): glibc grows
    M_MMAP_THRESHOLD dynamically to the size of any freed mmap'd block
    (capped at 32 MiB), so after round 1 a smaller allocation can be
    served from retained, already-faulted heap pages — first_touch_gb_s
    would silently measure warm writes and page_fault_stalled read
    false-healthy during a real stall, poisoning the host keys embedded
    in committed BENCH_* artifacts. Enforced HERE, not just the CLI,
    because library callers (bench.host_condition, tests) embed the
    verdict too (review r15). The 64/256 MiB production sizes clear the
    cap; tests use 48.
    """
    _check_size(size_mb)
    import numpy as np  # baked into the container; keep import local

    buf = b"\xa5" * _MB
    cpu1 = _cpu_single_gb_s(buf, 64)
    workers = min(32, os.cpu_count() or 1)
    cpu_n, steal = _cpu_parallel(buf, burst_s, workers)

    n = size_mb * _MB // 8  # float64 count
    first, warm = [], []
    for _ in range(rounds):
        a = np.empty(n)  # fresh mmap: virtual only, nothing faulted yet
        t0 = time.monotonic()
        a.fill(1.0)  # first touch: every write faults a new page
        first.append(size_mb / 1024.0 / (time.monotonic() - t0))
        t0 = time.monotonic()
        a.fill(2.0)  # pages resident: pure write bandwidth
        warm.append(size_mb / 1024.0 / (time.monotonic() - t0))
        del a
    ft, ww = statistics.median(first), statistics.median(warm)
    pages = size_mb * _MB / 4096.0
    # per-page fault cost, net of the write itself
    fault_us = max(0.0, (size_mb / 1024.0) * (1.0 / ft - 1.0 / ww)) / pages * 1e6
    scale = cpu_n / cpu1 if cpu1 > 0 else None
    capped = bool(
        (scale is not None and scale * CAP_SCALE_DIVISOR < workers)
        or (steal is not None and steal > CAP_STEAL_PCT)
    )
    return {
        "metric": "host_probe",
        "cpu_single_gb_s": round(cpu1, 2),
        "cpu_parallel_gb_s": round(cpu_n, 2),
        "cpu_parallel_scale": round(scale, 1) if scale is not None else None,
        "steal_pct": round(steal, 1) if steal is not None else None,
        "first_touch_gb_s": round(ft, 2),
        "first_touch_min_gb_s": round(min(first), 2),
        "first_touch_max_gb_s": round(max(first), 2),
        "warm_write_gb_s": round(ww, 2),
        "fault_us_per_page": round(fault_us, 2),
        "page_fault_stalled": bool(ft * STALL_FACTOR < ww),
        "cpu_capped": capped,
        # workers = burst width (capped at 32); cpus = what the host
        # exposes — artifacts from wider hosts must not read as 32-core
        # (review r15)
        "workers": workers,
        "cpus": os.cpu_count() or 1,
        "size_mb": size_mb,
        "rounds": rounds,
    }


def main() -> None:
    args = sys.argv[1:]
    size_mb = 256
    if "--size-mb" in args:
        i = args.index("--size-mb")
        if i + 1 >= len(args):
            raise SystemExit("--size-mb needs a value")
        try:
            size_mb = int(args[i + 1])
        except ValueError:
            raise SystemExit(f"--size-mb must be an integer, got {args[i + 1]!r}")
        del args[i : i + 2]
    if args:
        raise SystemExit(f"unknown arguments: {args}; usage: host_probe.py [--size-mb N]")
    try:
        _check_size(size_mb)
    except ValueError as e:
        # the shared guard converts to the tool's refusal style HERE,
        # before measurement — probe() itself stays un-wrapped so a real
        # mid-measurement ValueError keeps its traceback (review r15)
        raise SystemExit(str(e))
    print(json.dumps(probe(size_mb=size_mb)))


if __name__ == "__main__":
    main()
