"""The ANN commit log across real PROCESS boundaries (VERDICT r14 #1).

tools/ann_mp_probe.py is the escalation tool (PASS at 64 spawn processes
x 100%-contested tokens; loud-failure onset ~48 zero-think-time writers,
all contract-compliant); this test runs the same probe at suite scale so
the cross-process seam — independent interpreters, cold caches,
independent fs handles, real O_EXCL/rename syscalls racing across
processes — stays pinned in every pytest run. No Spark: the probe drives
the manifest dance (mktempdir -> rename -> _commit_manifest_entry)
directly, exactly ann_index_append's sequence minus the encode job.
"""

from __future__ import annotations

import importlib
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_probe():
    # a plain import (tools/ on sys.path), NOT spec_from_file_location:
    # the spawn context pickles worker functions by module name, so the
    # child processes must be able to `import ann_mp_probe` themselves —
    # sys.path is forwarded to spawn children, a detached spec is not
    tools = os.path.join(_REPO, "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    return importlib.import_module("ann_mp_probe")


def test_multiprocess_commit_log_exactly_once(tmp_path):
    """6 spawn processes x 8 commits, 25% twin tokens: zero failures from
    the probe's own invariant battery (exactly-once per token, linear
    retained chain, disk==manifest, monotone concurrent reader), plus the
    arithmetic the battery implies: every attempt accounted for, and the
    head version is exactly 1 (the build manifest) + one per commit."""
    probe = _load_probe()
    v = probe.run_probe(procs=6, commits=8, base=str(tmp_path / "store"))
    assert v["failures"] == []
    assert v["ok"]
    assert (
        v["committed"] + v["lost_to_twin_or_skipped"] + v["loud_failures"]
        == v["attempts"]
    )
    assert v["head_version"] == v["committed"] + 1
    assert v["reader_polls"] > 0


def test_multiprocess_all_tokens_contested(tmp_path):
    """share_frac=1.0 — EVERY token has two uncoordinated cross-process
    contenders (the at-least-once driver replaying on another machine):
    exactly one winner each, exactly-once store contents survive."""
    probe = _load_probe()
    v = probe.run_probe(
        procs=4, commits=6, share_frac=1.0, base=str(tmp_path / "store")
    )
    assert v["failures"] == []
    assert v["ok"]
    # all tokens shared; each committed exactly once despite contention
    assert v["shared_tokens"] == 4 * 6
    assert v["unique_tokens"] == 0
    assert v["head_version"] == v["committed"] + 1


def test_multiprocess_compactor_race(tmp_path):
    """VERDICT r15 #1 at suite scale: 4 spawn writers x 6 commits racing
    2 spawn COMPACTORS over one store — the real _compact_dirs dance
    (grace sweep, fold, rename, rival-loss guard, committed-vs-lost
    resolution) across independent interpreters and fs handles. The
    compact-aware battery holds: exactly-once per token THROUGH folds,
    token conservation across every retained version pair, folded
    content byte-identical to the manifest's token set, reader version/
    token series monotone. Escalated in tool runs to 64 writers x 12
    all-contested x 8 compactors (PASS; 433 rival losses, 26 loud
    fold-read races, zero silent losses — see SCALE.md)."""
    probe = _load_probe()
    v = probe.run_probe(
        procs=4, commits=6, base=str(tmp_path / "store"), compactors=2
    )
    assert v["failures"] == []
    assert v["ok"]
    assert (
        v["committed"] + v["lost_to_twin_or_skipped"] + v["loud_failures"]
        == v["attempts"]
    )
    cs = v["compactor_stats"]
    assert cs["bugs"] == []
    # both compactors reported; at this scale at least one cycle ran
    assert cs["cycles"] >= 1


def test_multiprocess_escalation_pin(tmp_path):
    """The escalation ladder's suite-scale anchor (VERDICT r15 #5): 16
    writers x 16 commits, half contested, 2 compactors — big enough that
    a future fscommit/ann_index change regressing ONLY under real
    contention fails the suite, small enough for CI (the 16x16x4 tool
    run walls ~2 s; the probe itself bounds child cleanup). The full
    ladder (up to 64x12 all-contested x 8 compactors) stays a tool run."""
    probe = _load_probe()
    v = probe.run_probe(
        procs=16, commits=16, share_frac=0.5,
        base=str(tmp_path / "store"), compactors=2,
    )
    assert v["failures"] == []
    assert v["ok"]
    # 16 workers x 16 owned tokens = 256 distinct tokens; every one
    # commits exactly once unless loud failures consumed ALL of a
    # token's contenders (unique tokens have one) — the battery already
    # proved commit-or-loud for each
    assert v["committed"] >= 16 * 16 - v["loud_failures"]
