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
