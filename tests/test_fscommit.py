"""The filesystem commit seam: plain paths stay os.rename, scheme paths
ride the Hadoop FileSystem API, copy+delete schemes refuse."""

from __future__ import annotations

import os

import pytest

from schemamap_spark.sources import fscommit


def test_scheme_routing(spark, tmp_path):
    assert isinstance(fscommit.fs_for(str(tmp_path)), fscommit._LocalFS)
    assert isinstance(
        fscommit.fs_for("file://" + str(tmp_path), spark), fscommit._HadoopFS
    )
    for bad in ("s3://b/k", "s3a://b/k", "gs://b/k", "abfss://c@a/k", "wasb://c@a/k"):
        with pytest.raises(ValueError, match="copy\\+delete"):
            fscommit.fs_for(bad, spark)


def test_hadoop_fs_primitives_on_file_uri(spark, tmp_path):
    fs = fscommit.fs_for("file://" + str(tmp_path), spark)
    base = "file://" + str(tmp_path)

    fs.mkdirs(base + "/d1")
    assert fs.exists(base + "/d1")
    fs.write_text(base + "/d1/x.txt", "hello")
    assert fs.read_text(base + "/d1/x.txt") == "hello"
    assert fs.listdir(base + "/d1") == ["x.txt"]
    assert fs.listsizes(base + "/d1") == [("x.txt", 5)]

    # atomic replace must take the FileContext OVERWRITE branch on file://
    fs.write_text(base + "/d1/y.txt", "new content")
    fs.replace_file(base + "/d1/y.txt", base + "/d1/x.txt")
    assert fs.last_replace_atomic is True
    assert fs.read_text(base + "/d1/x.txt") == "new content"
    assert not fs.exists(base + "/d1/y.txt")

    fs.rename(base + "/d1", base + "/d2")
    assert fs.exists(base + "/d2") and not fs.exists(base + "/d1")
    tmp = fs.mktempdir(base, ".stage_")
    assert fs.exists(tmp) and fscommit.basename(tmp).startswith(".stage_")
    fs.delete(tmp)
    assert not fs.exists(tmp)
    fs.delete(base + "/d2")
    assert not fs.exists(base + "/d2")


def test_local_fs_matches_hadoop_semantics(tmp_path):
    fs = fscommit.fs_for(str(tmp_path))
    d = str(tmp_path / "d")
    fs.mkdirs(d)
    fs.write_text(d + "/a.txt", "v1")
    fs.write_text(d + "/b.txt", "v2")
    fs.replace_file(d + "/b.txt", d + "/a.txt")
    assert fs.read_text(d + "/a.txt") == "v2"
    assert fs.listsizes(d) == [("a.txt", 2)]
    tmp = fs.mktempdir(str(tmp_path), ".stage_")
    assert os.path.isdir(tmp)


def test_replace_file_fallback_branch(spark, tmp_path, monkeypatch):
    """When FileContext machinery is unavailable, replace_file must take
    the rename-aside fallback (last_replace_atomic False), still replace
    the content, and leave no aside debris on success."""
    fs = fscommit.fs_for("file://" + str(tmp_path), spark)
    base = "file://" + str(tmp_path)
    fs.write_text(base + "/cur.json", "v1")
    fs.write_text(base + "/next.json", "v2")
    monkeypatch.setattr(
        fscommit._HadoopFS, "_filecontext_renamer", lambda self, dst: None
    )
    fs.replace_file(base + "/next.json", base + "/cur.json")
    assert fs.last_replace_atomic is False
    assert fs.read_text(base + "/cur.json") == "v2"
    assert not fs.exists(base + "/next.json")
    assert fs.listdir(base) == ["cur.json"]  # no .replaced.* left behind

    # first-commit case: no dst yet — fallback must still work
    fs.write_text(base + "/new.json", "v3")
    fs.replace_file(base + "/new.json", base + "/fresh.json")
    assert fs.read_text(base + "/fresh.json") == "v3"


def test_replace_file_fallback_failed_rename_restores_dst(
    spark, tmp_path, monkeypatch
):
    """The ADVICE r7 data-loss window: in the fallback, a failed src→dst
    rename must NOT strand a missing destination — dst was moved aside,
    and the failure rolls it back, so the committed manifest survives a
    failed commit."""
    fs = fscommit.fs_for("file://" + str(tmp_path), spark)
    base = "file://" + str(tmp_path)
    fs.write_text(base + "/manifest.json", "committed")
    fs.write_text(base + "/next.json", "candidate")
    monkeypatch.setattr(
        fscommit._HadoopFS, "_filecontext_renamer", lambda self, dst: None
    )
    real_rename = fscommit._HadoopFS.rename

    def failing_rename(self, src, dst):
        if fscommit.basename(src) == "next.json":
            raise OSError("injected rename failure")
        return real_rename(self, src, dst)

    monkeypatch.setattr(fscommit._HadoopFS, "rename", failing_rename)
    with pytest.raises(OSError, match="injected rename failure"):
        fs.replace_file(base + "/next.json", base + "/manifest.json")
    # the committed destination is back in place, byte-identical
    assert fs.read_text(base + "/manifest.json") == "committed"


def test_replace_file_atomic_branch_failure_propagates(
    spark, tmp_path, monkeypatch
):
    """A genuine FileContext rename failure is a FAILED COMMIT: it must
    propagate, not fall through to delete+rename (the r7 catch-all did
    exactly that and could delete dst with nothing to replace it)."""
    fs = fscommit.fs_for("file://" + str(tmp_path), spark)
    base = "file://" + str(tmp_path)
    fs.write_text(base + "/manifest.json", "committed")

    class _FailingFC:
        def rename(self, *a):
            raise RuntimeError("quota exceeded")

    monkeypatch.setattr(
        fscommit._HadoopFS,
        "_filecontext_renamer",
        lambda self, dst: (_FailingFC(), None),
    )
    fs.write_text(base + "/next.json", "candidate")
    with pytest.raises(Exception, match="quota exceeded"):
        fs.replace_file(base + "/next.json", base + "/manifest.json")
    # dst untouched — the failure never cascaded into the delete fallback
    assert fs.read_text(base + "/manifest.json") == "committed"


def test_scheme_path_without_session_raises(monkeypatch):
    """A scheme path with no active session (e.g. ann_index_drift called
    from a plain script) must fail with a clear message, not an obscure
    py4j error."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    with pytest.raises(ValueError, match="active SparkSession"):
        fscommit.fs_for("file:///tmp/x")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _seg = st.text(
        alphabet="abcdefgh0123_-.", min_size=1, max_size=10
    ).filter(lambda s: s not in (".", ".."))

    @settings(max_examples=200, deadline=None)
    @given(
        parent=st.sampled_from(
            ["/abs/p", "/w", "file:///a/b", "hdfs://nn:8020/x", "file:///a/"]
        ),
        names=st.lists(_seg, min_size=1, max_size=3),
    )
    def test_path_helper_properties(parent, names):
        """join/basename/dirname/split_scheme are mutually consistent for
        plain absolute paths and URIs alike — the invariants every store's
        path arithmetic rides on."""
        path = fscommit.join(parent, *names)
        assert fscommit.basename(path) == names[-1]
        assert fscommit.split_scheme(path) == fscommit.split_scheme(parent)
        assert "//" not in path.split("://", 1)[-1]
        one = fscommit.join(parent, names[0])
        assert fscommit.dirname(one) == parent.rstrip("/")
        assert fscommit.basename(fscommit.dirname(path)) == (
            names[-2] if len(names) > 1 else fscommit.basename(parent.rstrip("/"))
        )
except ImportError:  # pragma: no cover
    pass


def test_uri_helpers():
    assert fscommit.split_scheme("/plain/p") is None
    assert fscommit.split_scheme("hdfs://nn/p") == "hdfs"
    assert fscommit.join("file:///a/", "b", "c") == "file:///a/b/c"
    assert fscommit.basename("file:///a/b/") == "b"
    assert fscommit.dirname("file:///a/b") == "file:///a"
    assert fscommit.dirname("rel") == os.path.dirname(os.path.abspath("rel"))


def test_rename_exclusive_local(tmp_path):
    """The commit-log claim primitive: publishes a COMPLETE file, exactly
    one concurrent claimant wins, loser's src is untouched."""
    fs = fscommit.fs_for(str(tmp_path))
    a = str(tmp_path / "a.tmp")
    b = str(tmp_path / "b.tmp")
    dst = str(tmp_path / "v1.json")
    fs.write_text(a, "winner")
    fs.write_text(b, "loser")
    fs.rename_exclusive(a, dst)
    assert fs.read_text(dst) == "winner"
    assert not os.path.exists(a)  # src consumed
    with pytest.raises(FileExistsError):
        fs.rename_exclusive(b, dst)
    assert fs.read_text(dst) == "winner"  # dst untouched by the loser
    assert fs.read_text(b) == "loser"  # loser's src intact (it can retry)


def test_rename_exclusive_file_uri(spark, tmp_path):
    """file:// drops to the local os.link branch (Java renameTo would
    silently overwrite) — same exclusive semantics end-to-end."""
    fs = fscommit.fs_for("file://" + str(tmp_path), spark)
    base = "file://" + str(tmp_path)
    fs.write_text(base + "/a.tmp", "first")
    fs.write_text(base + "/b.tmp", "second")
    fs.rename_exclusive(base + "/a.tmp", base + "/v1.json")
    assert fs.read_text(base + "/v1.json") == "first"
    with pytest.raises(FileExistsError):
        fs.rename_exclusive(base + "/b.tmp", base + "/v1.json")
    assert fs.read_text(base + "/v1.json") == "first"


def test_rename_exclusive_file_uri_inherits_hardlink_fallback(
    spark, tmp_path, monkeypatch
):
    """The file:// branch delegates to the _LocalFS primitive, so a
    link-incapable local mount gets the same O_EXCL fallback there too
    (pre-r9 it called os.link directly and would raise raw OSError)."""
    import errno

    def no_link(src, dst):
        raise OSError(errno.EPERM, "Operation not permitted (no hardlinks)")

    monkeypatch.setattr(fscommit.os, "link", no_link)
    fs = fscommit.fs_for("file://" + str(tmp_path), spark)
    base = "file://" + str(tmp_path)
    fs.write_text(base + "/c.tmp", "claimed")
    fs.rename_exclusive(base + "/c.tmp", base + "/v2.json")
    assert fs.read_text(base + "/v2.json") == "claimed"
    assert not (tmp_path / "c.tmp").exists()


def test_rename_exclusive_hardlink_fallback(tmp_path, monkeypatch):
    """ADVICE r8 (low): on filesystems without hard links (FAT/exFAT,
    some NFS/FUSE mounts) os.link fails with a capability errno —
    rename_exclusive falls back to an O_EXCL create of the buffered
    content, keeping both claim properties (exactly-one-winner, full
    content). Non-capability link failures propagate unchanged."""
    import errno

    fs = fscommit._LocalFS()

    def no_link(src, dst):
        raise OSError(errno.EPERM, "Operation not permitted (no hardlinks)")

    monkeypatch.setattr(fscommit.os, "link", no_link)
    a = tmp_path / "a.tmp"
    a.write_text('{"v": 1}')
    dst = str(tmp_path / "claim.json")
    fs.rename_exclusive(str(a), dst)
    assert open(dst).read() == '{"v": 1}'  # full content published
    assert not a.exists()  # src consumed, like the link path

    # a second claimant still loses loudly, and dst is untouched
    b = tmp_path / "b.tmp"
    b.write_text('{"v": 2}')
    with pytest.raises(FileExistsError):
        fs.rename_exclusive(str(b), dst)
    assert open(dst).read() == '{"v": 1}'
    assert b.exists()  # loser's src survives for the caller to clean up

    # a REAL link failure (IO error, quota) is not a capability signal —
    # it must propagate as itself, not silently demote the primitive
    def eio_link(src, dst):
        raise OSError(errno.EIO, "I/O error")

    monkeypatch.setattr(fscommit.os, "link", eio_link)
    c = tmp_path / "c.tmp"
    c.write_text("x")
    with pytest.raises(OSError) as ei:
        fs.rename_exclusive(str(c), str(tmp_path / "other.json"))
    assert ei.value.errno == errno.EIO
    assert not (tmp_path / "other.json").exists()


def test_hardlink_fallback_short_writes_and_enospc_cleanup(
    tmp_path, monkeypatch
):
    """Code-review r9: os.write may write fewer bytes than asked — the
    fallback must loop to publish FULL content; and a recoverable write
    fault (ENOSPC) must unlink the created dst before propagating so the
    claim slot isn't poisoned by a half-written file."""
    import errno

    fs = fscommit._LocalFS()

    def no_link(src, dst):
        raise OSError(errno.EPERM, "no hardlinks")

    monkeypatch.setattr(fscommit.os, "link", no_link)

    # short writes: 1 byte per os.write call
    real_write = os.write

    def one_byte(fd, data):
        return real_write(fd, bytes(data[:1]))

    monkeypatch.setattr(fscommit.os, "write", one_byte)
    a = tmp_path / "a.tmp"
    a.write_text('{"payload": "0123456789"}')
    dst = str(tmp_path / "full.json")
    fs.rename_exclusive(str(a), dst)
    assert open(dst).read() == '{"payload": "0123456789"}'

    # ENOSPC mid-write: dst must not survive as a torn claim
    def fails_midway(fd, data):
        raise OSError(errno.ENOSPC, "disk full")

    monkeypatch.setattr(fscommit.os, "write", fails_midway)
    b = tmp_path / "b.tmp"
    b.write_text("content")
    with pytest.raises(OSError) as ei:
        fs.rename_exclusive(str(b), str(tmp_path / "poisoned.json"))
    assert ei.value.errno == errno.ENOSPC
    assert not (tmp_path / "poisoned.json").exists()  # slot not poisoned
    assert b.exists()  # src kept — the caller's retry re-publishes it
