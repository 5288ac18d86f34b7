"""Filesystem commit seam — one place that knows how to rename-commit.

Every store in the repo (warehouse parquet swaps, the ANN index store, the
SMO snapshot) publishes data the same way: write to a temp location, then
an atomic rename makes it visible. Until round 7 that protocol was
hard-wired to os.rename, so any URI-scheme path raised loudly. This module
is the port: the same five primitives (exists / rename / delete / read /
write-atomic + listing) behind one seam, with two implementations —

- ``_LocalFS`` — plain paths (no scheme): os.* / shutil, byte-identical to
  the old behavior. No Spark session required (ann_index_drift stays
  driver-only arithmetic).
- ``_HadoopFS`` — ``scheme://`` paths: the Hadoop FileSystem API through
  the live session's JVM (``spark._jvm``). Directory renames go through
  ``FileSystem.rename`` — atomic on HDFS-like stores and on ``file:``
  (RawLocalFileSystem delegates to rename(2)). Single-file commits
  (manifest pointers) go through ``FileContext.rename(...OVERWRITE)``,
  the HDFS-atomic replace; if the FileContext path is unavailable the
  fallback is delete+rename with a documented non-atomic instant.

Honesty guard: object stores whose Hadoop connector FAKES rename as
copy+delete (s3a, gs, abfs without hierarchical namespace, oss, swift,
wasb) still raise — the commit protocol's crash contract genuinely does
not hold there, and pretending otherwise is how stores corrupt. Those
deployments need a manifest-pointer layout (the ANN store already has
one) or a table format with its own commit log.

The sandbox's only real scheme is ``file:``, so that is what the tests
drive end-to-end; the seam is the same code path an ``hdfs://`` warehouse
would take.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

# Hadoop FileSystem.rename is a real metadata rename on these schemes —
# the commit contract holds. Everything else with a scheme raises.
_ATOMIC_RENAME_SCHEMES = {"file", "hdfs", "viewfs", "webhdfs", "ofs", "o3fs"}


def split_scheme(path: str) -> str | None:
    """'hdfs://nn/x' -> 'hdfs'; '/plain/path' -> None."""
    if "://" not in path:
        return None
    return path.split("://", 1)[0]


def fs_for(path: str, spark=None):
    """Pick the implementation for `path`. Plain paths never need Spark;
    scheme paths resolve a Hadoop FileSystem through the active session's
    JVM (pass `spark` explicitly or have an active session)."""
    scheme = split_scheme(path)
    if scheme is None:
        return _LocalFS()
    if scheme not in _ATOMIC_RENAME_SCHEMES:
        raise ValueError(
            f"scheme {scheme!r} ({path!r}): its Hadoop connector implements "
            "rename as copy+delete, so the rename-commit crash contract does "
            "not hold. Use a manifest-pointer layout or a table format with "
            "its own commit log for this store."
        )
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError(
                f"scheme path {path!r} needs an active SparkSession (the "
                "Hadoop FileSystem rides the session JVM)"
            )
    return _HadoopFS(spark)


class _LocalFS:
    """os/shutil implementation for plain local paths."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace_file(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def rename_exclusive(self, src: str, dst: str) -> None:
        """Atomic create-exclusive publish of a COMPLETE file: dst appears
        with src's full content or not at all, and exactly one concurrent
        caller wins (FileExistsError for the rest). os.link is the POSIX
        primitive with both properties — os.rename would silently
        overwrite an existing dst.

        Filesystems WITHOUT hard links (FAT/exFAT, some NFS/FUSE mounts)
        surface that as EPERM/EACCES/EOPNOTSUPP/ENOSYS from link(2); those
        fall back to an O_EXCL create of the fully-buffered content —
        same exactly-one-winner guarantee (O_EXCL is atomic), with a
        WEAKER visibility contract: dst exists (empty/partial) between
        the create and the final write — a concurrent reader can observe
        a torn file for the microseconds the write takes (hard links
        can't tear), and a claimant KILLED in that window leaves the torn
        dst permanently. Readers of claim files must therefore treat
        unparseable content as in-flight and retry briefly
        (ann_index._load_manifest does). A recoverable write error
        (ENOSPC, EIO) unlinks the created dst before propagating so a
        surviving process doesn't poison the claim slot; any non-capability
        link error (quota, IO) propagates unchanged."""
        import errno

        try:
            os.link(src, dst)
        except OSError as e:
            # FileExistsError carries EEXIST, which is not a capability
            # errno, so the tuple test alone re-raises the lost-claim case
            if e.errno not in (
                errno.EPERM, errno.EACCES, errno.EOPNOTSUPP,
                errno.ENOTSUP, errno.ENOSYS,
            ):
                raise
            with open(src, "rb") as f:
                data = f.read()
            fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            try:
                view = memoryview(data)
                while view:  # os.write may write fewer bytes than asked
                    view = view[os.write(fd, view):]
                os.fsync(fd)
            except BaseException:
                os.close(fd)
                # the claim slot must not be poisoned by a half-written
                # file when this process survives to clean up (a hard
                # kill in this window still leaves torn dst — documented)
                try:
                    os.unlink(dst)
                except OSError:
                    pass
                raise
            os.close(fd)
        os.unlink(src)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def copydir(self, src: str, dst: str, ignore_names: tuple = ()) -> None:
        """Recursive storage-level copy; dst must not exist. ignore_names
        are skipped (shutil filters them at every level; the Hadoop twin
        filters the top level, which is all the snapshot layout needs)."""
        ignore = shutil.ignore_patterns(*ignore_names) if ignore_names else None
        shutil.copytree(src, dst, ignore=ignore)

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass  # a concurrent deleter got there first — same outcome

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def listsizes(self, path: str) -> list[tuple[str, int]]:
        return [
            (f, os.path.getsize(os.path.join(path, f)))
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        ]

    def mktempdir(self, parent: str, prefix: str) -> str:
        self.mkdirs(parent)
        return tempfile.mkdtemp(dir=parent, prefix=prefix)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        with open(path, "w") as f:
            f.write(data)


class _CondPutFS(_LocalFS):
    """IN-CONTAINER PROTOCOL DOUBLE — never selected by fs_for (the honest
    raise for s3a/gs/abfss stands until a real connector can run the same
    battery end-to-end). Models an object store whose ONLY exclusive
    publish primitive is a CONDITIONAL PUT of complete content (S3
    `If-None-Match: *`, GCS `ifGenerationMatch=0`, ABFS ETag
    preconditions — the SCALE.md r9 design note): `rename_exclusive` uses
    no hardlink and no rename — the claim object materializes whole-or-
    not-at-all in an in-process blob overlay under one lock, with
    exactly-one-winner on the if-absent check. That is the store
    semantics being proven: no torn window exists, so the O_EXCL-fallback
    caveats don't apply here.

    Everything else inherits the local implementation as a stand-in for
    the store's data plane: batch-dir renames would be direct-to-final
    writes on a real store (invisible until the manifest references
    them), and `replace_file` (the advisory manifest.json pointer) would
    be a plain unconditional PUT — the commit protocol's correctness
    never depends on either, which is exactly what running the ANN
    commit-log battery over this double demonstrates.

    Claim objects are also WRITTEN THROUGH to disk (best-effort, after
    the atomic overlay insert) purely so tests and humans can inspect the
    store tree with plain file tools; protocol reads always consult the
    overlay first, so the write-through's non-atomicity is unobservable
    through this interface. `delete` removes both copies."""

    def __init__(self):
        import threading

        self._blobs: dict[str, str] = {}
        self._lock = threading.Lock()

    def rename_exclusive(self, src: str, dst: str) -> None:
        with open(src) as f:
            data = f.read()
        key = os.path.abspath(dst)
        with self._lock:
            if key in self._blobs or os.path.exists(dst):
                raise FileExistsError(dst)
            self._blobs[key] = data  # the conditional PUT: all-or-nothing
            try:  # observability shadow only — see class docstring. Under
                # the same lock as the insert: outside it, a concurrent
                # delete() landing between insert and shadow-write would be
                # UNDONE by the late shadow (a resurrected claim file the
                # fallback reads serve; code-review r10)
                with open(dst, "w") as f:
                    f.write(data)
            except OSError:
                pass
        os.unlink(src)

    def exists(self, path: str) -> bool:
        with self._lock:
            if os.path.abspath(path) in self._blobs:
                return True
        return super().exists(path)

    def read_text(self, path: str) -> str:
        with self._lock:
            data = self._blobs.get(os.path.abspath(path))
        if data is not None:
            return data
        return super().read_text(path)

    def delete(self, path: str) -> None:
        with self._lock:  # pop + disk delete atomically vs rename_exclusive
            self._blobs.pop(os.path.abspath(path), None)
            super().delete(path)

    def listdir(self, path: str) -> list[str]:
        d = os.path.abspath(path)
        names = set(super().listdir(path))
        with self._lock:
            names.update(
                os.path.basename(k)
                for k in self._blobs
                if os.path.dirname(k) == d
            )
        return sorted(names)


class _HadoopFS:
    """Hadoop FileSystem implementation for scheme paths, via spark._jvm.
    Each operation resolves the FileSystem from the path itself, so one
    instance serves any scheme the JVM can load."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._p(path).getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        return bool(self._fs(path).exists(self._p(path)))

    def mkdirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._p(path))

    def rename(self, src: str, dst: str) -> None:
        ok = self._fs(src).rename(self._p(src), self._p(dst))
        if not ok:
            raise OSError(f"Hadoop rename failed: {src!r} -> {dst!r}")

    def _filecontext_renamer(self, dst: str):
        """Resolve the FileContext atomic-replace machinery for dst's
        filesystem, or None when it is genuinely UNAVAILABLE (no
        AbstractFileSystem binding for the scheme — e.g. webhdfs). Split
        out from replace_file so that ONLY resolution failures select the
        non-atomic fallback; a failure of the rename itself (permissions,
        quota, src race) must propagate, not silently demote the commit
        to the fallback path."""
        jvm = self._jvm
        try:
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._p(dst).toUri(), self._conf
            )
            overwrite = getattr(
                jvm, "org.apache.hadoop.fs.Options$Rename"
            ).valueOf("OVERWRITE")
            renames = jvm.java.lang.reflect.Array.newInstance(
                overwrite.getClass(), 1
            )
            renames[0] = overwrite
        except Exception:
            return None
        return fc, renames

    def replace_file(self, src: str, dst: str) -> None:
        """Atomic single-file replace. FileContext.rename with OVERWRITE is
        the HDFS-atomic primitive; py4j reaches the nested enum as
        Options$Rename. If that machinery is unavailable for the FS, fall
        back to rename-aside + rename — a documented non-atomic instant in
        which the destination is missing (never torn), and one a FAILED
        commit rolls back from: dst is moved aside (never deleted), so if
        the src→dst rename then fails the original dst is restored and the
        store keeps its last committed state. `last_replace_atomic` records
        which branch ran, so tests can pin that the atomic path is live.
        A genuine rename failure on either branch propagates to the
        caller — it is a failed commit, not a cue to start deleting."""
        ctx = self._filecontext_renamer(dst)
        if ctx is not None:
            fc, renames = ctx
            fc.rename(self._p(src), self._p(dst), renames)
            self.last_replace_atomic = True
            return
        self.last_replace_atomic = False
        aside = dst + ".replaced." + uuid.uuid4().hex[:8]
        had_dst = self.exists(dst)
        if had_dst:
            self.rename(dst, aside)
        try:
            self.rename(src, dst)
        except BaseException:
            if had_dst:
                try:
                    self.rename(aside, dst)  # roll back to the committed dst
                except Exception:
                    pass  # aside copy survives on disk; original error wins
            raise
        if had_dst:
            self.delete(aside)

    def delete(self, path: str) -> None:
        fs = self._fs(path)
        p = self._p(path)
        if fs.exists(p):
            fs.delete(p, True)

    def rename_exclusive(self, src: str, dst: str) -> None:
        """Atomic create-exclusive publish of a COMPLETE file (see the
        _LocalFS twin). On HDFS-class filesystems FileSystem.rename is
        specified to FAIL (return false) when dst exists, which is the
        exclusive-claim semantics needed. file:// is the exception —
        RawLocalFileSystem delegates to Java File.renameTo, i.e.
        rename(2), which silently OVERWRITES — so file:// paths drop to
        the local os.link primitive (by definition the JVM and driver
        share that filesystem). A rename that returns false for any
        reason is reported as FileExistsError: for the CAS claim loop
        that means 'retry from a fresh read', which is also the correct
        response to a transient failure."""
        if split_scheme(src) == "file":
            # same primitive as plain paths — including the O_EXCL
            # fallback for link-incapable local filesystems
            _LocalFS().rename_exclusive(
                src[len("file://"):], dst[len("file://"):]
            )
            return
        fs = self._fs(dst)
        if fs.exists(self._p(dst)):
            raise FileExistsError(dst)
        if not fs.rename(self._p(src), self._p(dst)):
            raise FileExistsError(dst)

    def isdir(self, path: str) -> bool:
        fs = self._fs(path)
        p = self._p(path)
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())

    def copydir(self, src: str, dst: str, ignore_names: tuple = ()) -> None:
        """Recursive storage-level copy via FileUtil.copy, skipping
        top-level ignore_names. dst is created; children copy one by one
        so the filter applies without a Hadoop PathFilter round-trip."""
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        sfs = self._fs(src)
        dfs = self._fs(dst)
        self.mkdirs(dst)
        for st in sfs.listStatus(self._p(src)):
            name = st.getPath().getName()
            if name in ignore_names:
                continue
            ok = FileUtil.copy(
                sfs, st.getPath(), dfs, self._p(join(dst, name)), False, self._conf
            )
            if not ok:
                raise OSError(f"Hadoop copy failed: {src}/{name} -> {dst}")

    def listdir(self, path: str) -> list[str]:
        fs = self._fs(path)
        return [s.getPath().getName() for s in fs.listStatus(self._p(path))]

    def listsizes(self, path: str) -> list[tuple[str, int]]:
        fs = self._fs(path)
        return [
            (s.getPath().getName(), s.getLen())
            for s in fs.listStatus(self._p(path))
            if s.isFile()
        ]

    def mktempdir(self, parent: str, prefix: str) -> str:
        self.mkdirs(parent)
        path = join(parent, prefix + uuid.uuid4().hex[:12])
        self.mkdirs(path)
        return path

    def read_text(self, path: str) -> str:
        fs = self._fs(path)
        stream = fs.open(self._p(path))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, data: str) -> None:
        fs = self._fs(path)
        out = fs.create(self._p(path), True)
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()


def is_missing_file(e: BaseException) -> bool:
    """True when `e` means 'the file is gone' on EITHER fs implementation:
    a Python FileNotFoundError from _LocalFS, or a py4j-wrapped
    java.io.FileNotFoundException from _HadoopFS. When the wrapper exposes
    the Java exception object (py4j's Py4JJavaError does), the TOP-LEVEL
    class name is compared exactly — a different Java failure whose
    rendered stack merely CONTAINS 'FileNotFoundException' somewhere in
    its cause chain must not be misclassified as 'file missing' (in
    ann_index._check_format that would silently downgrade an unreadable
    marker to 'legacy store' and commit anyway; ADVICE r9). The substring
    check survives only as the last resort for wrappers that surface
    nothing but a rendered message (there is no shared exception type to
    isinstance against without importing py4j here). Lives on the fs seam
    because every consumer of fs_for's read paths needs the same
    classification (ann_index head reads, the shard-manifest read)."""
    if isinstance(e, FileNotFoundError):
        return True
    je = getattr(e, "java_exception", None)
    if je is not None:
        try:
            # walk the CLASS HIERARCHY, not just the top name: FNF
            # subclasses mean the same miss, and HDFS IPC wraps the
            # server-side class in a RemoteException whose real name
            # rides getClassName() (code-review r10 — an exact-name
            # compare would turn the benign pruned-head race back into a
            # hard reader failure on hdfs/viewfs). Hadoop's
            # PathNotFoundException ("the path is gone") is accepted BY
            # NAME at any level: it is NOT an FNF subclass (verified:
            # PathNotFoundException -> PathIOException -> IOException),
            # so the hierarchy walk alone would miss it
            _MISS = (
                "java.io.FileNotFoundException",
                "org.apache.hadoop.fs.PathNotFoundException",
            )
            cls = je.getClass()
            while cls is not None:
                name = cls.getName()
                if name in _MISS:
                    return True
                if name == "org.apache.hadoop.ipc.RemoteException":
                    # the server-side class rides getClassName() as a
                    # STRING — no hierarchy to walk, so accept the known
                    # missing-file family by name
                    cn = je.getClassName()
                    return cn.endswith("FileNotFoundException") or cn in _MISS
                cls = cls.getSuperclass()
            return False
        except Exception:
            return False  # unreadable wrapper: treat as a real failure
    return "FileNotFoundException" in str(e)


def join(parent: str, *names: str) -> str:
    """Path join that works for both plain paths and URIs (os.path.join
    would be fine for both on POSIX, but keep URI separators explicit)."""
    out = parent.rstrip("/")
    for n in names:
        out = out + "/" + n.strip("/")
    return out


def basename(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


def dirname(path: str) -> str:
    scheme = split_scheme(path)
    if scheme is None:
        return os.path.dirname(os.path.abspath(path))
    head = path.rstrip("/").rsplit("/", 1)[0]
    return head
