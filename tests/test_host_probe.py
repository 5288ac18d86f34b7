"""tools/host_probe.py — the host-weather arbiter (r15).

The probe exists because identical-code bench totals moved 17 s <-> 30 s
within one round while every container-side load signal stayed green; its
output rides inside every BENCH_* artifact, so its shape and refusal
contracts get pins like the other bench tools. Verdict VALUES
(page_fault_stalled / cpu_capped / steal_pct) are weather, not code —
nothing here asserts them beyond type, or the suite would flake on
exactly the pathology the probe measures.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def host_probe():
    spec = importlib.util.spec_from_file_location(
        "host_probe", os.path.join(_REPO, "tools", "host_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def result(host_probe):
    # one real (small) measurement shared by the shape pins: 48 MiB is
    # the smallest size safely above glibc's DYNAMIC mmap threshold —
    # M_MMAP_THRESHOLD grows to the size of freed mmap'd blocks, capped
    # at 32 MiB, so anything <= 32 MiB can recycle already-faulted heap
    # pages after round 1 and measure warm writes as first-touch. The
    # short burst keeps the test fast; steal resolution is not asserted.
    return host_probe.probe(size_mb=48, rounds=2, burst_s=0.2)


def test_probe_shape_and_types(result):
    assert result["metric"] == "host_probe"
    for k in (
        "cpu_single_gb_s",
        "cpu_parallel_gb_s",
        "first_touch_gb_s",
        "first_touch_min_gb_s",
        "first_touch_max_gb_s",
        "warm_write_gb_s",
    ):
        # >= 0, not > 0: the values are rounded to 2 decimals, so an
        # extreme first-touch stall (< 0.005 GB/s — exactly the weather
        # the probe exists to measure) legitimately rounds to 0.0; a
        # strict > 0 would flake on the pathology itself (ADVICE r15)
        assert isinstance(result[k], float) and result[k] >= 0, k
    assert result["fault_us_per_page"] >= 0
    assert isinstance(result["page_fault_stalled"], bool)
    assert isinstance(result["cpu_capped"], bool)
    assert result["steal_pct"] is None or result["steal_pct"] >= 0
    assert result["cpus"] >= result["workers"] >= 1
    assert (result["size_mb"], result["rounds"]) == (48, 2)
    # min <= median <= max, by construction of the rounds
    assert (
        result["first_touch_min_gb_s"]
        <= result["first_touch_gb_s"]
        <= result["first_touch_max_gb_s"]
    )


def test_probe_json_round_trips(result):
    # the dict is embedded verbatim in bench artifacts — everything in it
    # must survive json (no numpy scalars, no NaN)
    assert json.loads(json.dumps(result)) == result


def test_verdict_thresholds(host_probe):
    # the classification boundary is code, not weather — pin the
    # (ft * STALL_FACTOR < ww) arithmetic at the two observed regimes:
    # the healthy 3x fault/zeroing gap must NOT flag, the measured 40x
    # pathology must
    assert not (8.0 * host_probe.STALL_FACTOR < 24.0)  # ft=8, ww=24: 3x gap
    assert 0.2 * host_probe.STALL_FACTOR < 8.0  # ft=0.2, ww=8: 40x gap
    # and the boundary itself is strictly between them
    assert 3.0 < host_probe.STALL_FACTOR < 40.0


@pytest.mark.parametrize(
    "argv",
    [
        ["--size-mb"],  # missing value
        ["--size-mb", "abc"],  # non-integer
        ["--size-mb", "0"],  # below floor
        ["--size-mb", "16"],  # <= glibc's 32 MiB threshold-growth cap:
        # rounds after the first could recycle faulted heap pages and
        # report warm writes as first-touch — false-healthy during a
        # real stall, so the CLI refuses (review r15)
        ["--frobnicate"],  # unknown flag
    ],
)
def test_cli_refusals(host_probe, monkeypatch, argv):
    monkeypatch.setattr("sys.argv", ["host_probe.py", *argv])
    with pytest.raises(SystemExit) as e:
        host_probe.main()
    assert e.value.code not in (0, None)


def test_probe_refuses_unsafe_size(host_probe):
    """The 33 MiB floor lives in probe() itself, not just the CLI —
    library callers (bench.host_condition) embed the verdict in
    committed artifacts, so a too-small size must refuse rather than
    report warm writes as first-touch (review r15)."""
    with pytest.raises(ValueError, match="33 MiB first-touch-safety"):
        host_probe.probe(size_mb=16)
    with pytest.raises(ValueError, match="floor"):
        host_probe.probe(size_mb=32)


def test_stat_ticks_shape(host_probe):
    ticks = host_probe._stat_ticks()
    # this container has a normal /proc/stat; elsewhere None is the
    # documented degradation (steal reported as unknown, never fake-0)
    assert ticks is None or (len(ticks) == 8 and all(t >= 0 for t in ticks))


def test_bench_embeds_host_condition():
    """bench.host_condition returns the probe dict on this container, and
    is best-effort by contract — a broken probe degrades to None instead
    of killing the bench run."""
    import sys

    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    import bench

    got = bench.host_condition()
    assert got is not None and got["metric"] == "host_probe"

    # the degradation path: probe() blowing up -> None, not an exception
    import host_probe as hp  # tools/ is on sys.path after the call above

    def _boom(**kw):
        raise RuntimeError("probe broken")

    orig = hp.probe
    hp.probe = _boom
    try:
        assert bench.host_condition() is None
    finally:
        hp.probe = orig


def test_weather_ok_envelope(host_probe):
    """weather_ok (VERDICT r15 #3): the machine-checkable form of the
    SCALE.md healthy envelope. A dict inside all three bounds passes;
    each single violation fails naming its key; a missing probe or an
    unmeasured key fails too — unprovable weather must never pass by
    omission (that is the gate's whole point)."""
    healthy = {
        "first_touch_gb_s": 5.0,
        "steal_pct": 0.2,
        "cpu_parallel_scale": 20.0,
    }
    ok, why = host_probe.weather_ok(healthy)
    assert ok and why == []
    # exactly-at-threshold is inside the envelope (>=, <=)
    ok, _ = host_probe.weather_ok({
        "first_touch_gb_s": host_probe.ENVELOPE_FIRST_TOUCH_GB_S,
        "steal_pct": host_probe.ENVELOPE_STEAL_PCT,
        "cpu_parallel_scale": host_probe.ENVELOPE_SCALE,
    })
    assert ok
    for key, bad in (
        ("first_touch_gb_s", 0.2),   # the r15 page-fault stall
        ("steal_pct", 25.3),         # the r15 steal cap
        ("cpu_parallel_scale", 4.5), # BENCH_r15's own host_after
    ):
        ok, why = host_probe.weather_ok({**healthy, key: bad})
        assert not ok and any(key in r for r in why), (key, why)
    # the scale bound follows the probe's burst width (review r16): a
    # healthy 4-wide host reads scale ~3 — far under the 32-wide rig's
    # absolute 7, and the gate must not deadlock there
    ok, why = host_probe.weather_ok({
        **healthy, "cpu_parallel_scale": 3.2, "workers": 4,
    })
    assert ok, why
    ok, why = host_probe.weather_ok({
        **healthy, "cpu_parallel_scale": 0.5, "workers": 4,  # capped 4-wide
    })
    assert not ok and any("cpu_parallel_scale" in r for r in why)
    # NaN parses from json and compares False against BOTH bounds — it
    # must read "unmeasured", never "in envelope" (the fail-open hole a
    # review found live: an all-NaN probe passed the combined gate);
    # bools are ints but not measurements
    for poison in (float("nan"), float("inf"), True):
        ok, why = host_probe.weather_ok({**healthy, "steal_pct": poison})
        assert not ok and any("steal_pct unmeasured" in r for r in why), poison
    # missing probe / unmeasured keys fail loudly, never by omission
    ok, why = host_probe.weather_ok(None)
    assert not ok and why == ["no host probe embedded"]
    ok, why = host_probe.weather_ok({**healthy, "steal_pct": None})
    assert not ok and any("steal_pct unmeasured" in r for r in why)
    ok, why = host_probe.weather_ok({})
    assert not ok and len(why) == 3
