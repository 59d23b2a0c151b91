"""Catalog on a Hadoop filesystem URI (file:/ in tests — the same
FileSystem client covers hdfs:// and s3a:// in a cluster), and the
vacuum generation-flip that replaced the r2 rename-swap window.

The reference reaches object stores through pluggable store backends
(impl.clj:77-119); here the catalog routes through
org.apache.hadoop.fs.FileSystem (mandoline_spark/fs.py) — the exact
client the Parquet data path already uses — so the commit semantics
(second committer to the same version fails, linear_versions.clj:61-67)
carry over unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mandoline_spark import reader, writer
from mandoline_spark.core import slab as sb
from mandoline_spark.core import slice as sl
from mandoline_spark.fs import HadoopFS, LocalFS, for_path, is_uri
from mandoline_spark.maintenance import vacuum
from mandoline_spark.store import Store, VersionConflict


def test_fs_dispatch(spark):
    assert is_uri("file:/tmp/x") and is_uri("hdfs://nn/x") and is_uri(
        "s3a://bucket/x"
    )
    assert not is_uri("/tmp/x") and not is_uri("relative/x")
    assert isinstance(for_path(spark, "/tmp/x"), LocalFS)
    assert isinstance(for_path(spark, "file:/tmp/x"), HadoopFS)


@pytest.fixture
def uri_store(spark, tmp_path):
    return Store(spark, f"file:{tmp_path}")


def _spec(n=8, c=4):
    return {
        "dimensions": {"x": n},
        "chunk-dimensions": {"x": c},
        "variables": {
            "v": {"type": "int", "shape": ["x"], "fill-value": -1}
        },
    }


def _write(conn, token, data, start=0):
    arr = np.asarray(data, np.int32)
    writer.write_variable(
        conn, token, "v",
        [sb.Slab(arr, sl.mk_slice((start,), (start + len(arr),)))],
    )


def test_engine_roundtrip_on_file_uri(uri_store):
    """create → write → commit → read → time travel, all catalog ops
    through the Hadoop client."""
    conn = uri_store.create_dataset("ds")
    assert uri_store.list_datasets() == ["ds"]
    t1 = conn.add_version(_spec())
    _write(conn, t1, np.arange(8))
    conn.finish_version(t1)
    t2 = conn.add_version(_spec())
    _write(conn, t2, [100, 101], start=2)
    conn.finish_version(t2)

    tok = reader.on_last_version(conn)
    got = reader.get_slice(conn, tok, "v", sl.mk_slice((0,), (8,)))
    assert got.data.tolist() == [0, 1, 100, 101, 4, 5, 6, 7]
    old = reader.on_nth_version(conn, 0)
    got1 = reader.get_slice(conn, old, "v", sl.mk_slice((0,), (8,)))
    assert got1.data.tolist() == list(range(8))

    stats = conn.get_stats()
    assert stats["data-size"] > 0 and stats["metadata-size"] > 0

    # latch-aware destroy audit (r10 verdict stretch #8): the two
    # commits above left parent-named latches (n0.json, n<v1>.json)
    # beside the id-named mirrors; destroy removes the whole dataset
    # directory, latches included — nothing survives to wedge a future
    # dataset re-created under the same name
    vdir = os.path.join(conn.path, "versions")
    latches = [
        f
        for f in conn.fs.listdir(vdir)
        if f.startswith("n") and f.endswith(".json")
    ]
    assert len(latches) == 2, latches
    uri_store.destroy_dataset("ds")
    assert uri_store.list_datasets() == []
    assert not conn.fs.isdir(os.path.join(uri_store.root, "ds"))


def test_commit_race_semantics_on_file_uri(uri_store):
    """Second committer to the same parent fails — the exclusive-create
    (Hadoop create overwrite=false) preserves O_EXCL semantics."""
    conn = uri_store.create_dataset("ds")
    a = conn.add_version(_spec())
    b = conn.add_version(_spec())
    _write(conn, a, np.arange(8))
    _write(conn, b, np.arange(8) * 2)
    conn.finish_version(a)
    with pytest.raises(VersionConflict):
        conn.finish_version(b)
    # and re-committing an already-committed version id fails even if
    # the parent check is raced past (direct exclusive-create test)
    fp = os.path.join(conn.path, "versions", f"{a['version-id']}.json")
    assert conn.fs.create_exclusive(fp, "x") is False


def test_already_exists_classified_by_class_not_message(spark):
    """Only FileAlreadyExists-shaped Java exceptions (direct, via cause
    chain, or wrapped in an HDFS RemoteException) read as a lost commit
    race; an unrelated error whose MESSAGE mentions 'exist' ('Parent
    path does not exist') must re-raise (ADVICE r03)."""

    class _JClass:
        def __init__(self, name):
            self._n = name

        def getName(self):
            return self._n

    class _JE:
        def __init__(self, name, cause=None, remote_cls=None):
            self._c = _JClass(name)
            self._cause = cause
            self._remote = remote_cls

        def getClass(self):
            return self._c

        def getCause(self):
            return self._cause

        def getClassName(self):
            return self._remote

    class _PyE(Exception):
        def __init__(self, je):
            self.java_exception = je

    ok = HadoopFS._is_already_exists
    assert ok(_PyE(_JE("org.apache.hadoop.fs.FileAlreadyExistsException")))
    assert ok(_PyE(_JE("java.nio.file.FileAlreadyExistsException")))
    assert ok(_PyE(_JE("org.apache.hadoop.fs.PathExistsException")))
    # wrapped one level down the cause chain
    assert ok(
        _PyE(
            _JE(
                "java.io.IOException",
                cause=_JE("org.apache.hadoop.fs.FileAlreadyExistsException"),
            )
        )
    )
    # HDFS RPC wrapping
    assert ok(
        _PyE(
            _JE(
                "org.apache.hadoop.ipc.RemoteException",
                remote_cls="org.apache.hadoop.fs.FileAlreadyExistsException",
            )
        )
    )
    # message says 'exist', class says otherwise -> NOT already-exists
    assert not ok(
        _PyE(_JE("java.io.FileNotFoundException"))
    )
    assert not ok(_PyE(_JE("java.net.ConnectException")))
    assert not ok(Exception("Parent path does not exist"))


def test_conditional_create_hook_replaces_commit_primitive(spark, tmp_path):
    """The S3 conditional-put injection point: when set, the hook IS the
    commit primitive — the Hadoop create path is never touched, and the
    hook's verdict is returned as-is."""
    fs = HadoopFS(spark, f"file:{tmp_path}")
    calls = []

    def fake_conditional_put(path, text):
        calls.append((path, text))
        return len(calls) == 1  # first committer wins, second loses

    fs.conditional_create = fake_conditional_put
    p = f"file:{tmp_path}/versions/7.json"
    assert fs.create_exclusive(p, "tok") is True
    assert fs.create_exclusive(p, "tok2") is False
    assert calls == [(p, "tok"), (p, "tok2")]
    # the real filesystem was bypassed entirely
    assert not fs.exists(p)


@pytest.mark.parametrize("root_kind", ["local", "uri"])
def test_vacuum_flips_chunk_generations(spark, tmp_path, root_kind):
    """Vacuum writes survivors BESIDE the live chunk dir and flips the
    CHUNKS pointer — the live directory always exists; repeated vacuums
    advance generations; reads stay correct throughout."""
    root = str(tmp_path) if root_kind == "local" else f"file:{tmp_path}"
    store = Store(spark, root)
    conn = store.create_dataset("ds")
    t1 = conn.add_version(_spec())
    _write(conn, t1, np.arange(8))
    conn.finish_version(t1)
    t2 = conn.add_version(_spec())
    _write(conn, t2, np.arange(8) + 50)
    conn.finish_version(t2)

    def read_all():
        tok = reader.on_last_version(conn)
        return reader.get_slice(
            conn, tok, "v", sl.mk_slice((0,), (8,))
        ).data.tolist()

    before = read_all()
    # Clean store: vacuum must NOT rewrite the chunk table (the r5
    # idempotence contract — a no-op vacuum used to burn a full
    # generation per call), so the default directory stays.
    s0 = vacuum(conn)
    assert s0["chunks_removed"] == 0
    assert not conn.chunks_path().endswith("chunks.g0")
    assert read_all() == before

    def orphan(data):
        # an uncommitted version's chunks become unreferenced once
        # vacuum drops its index tree — the rewrite path's trigger
        t = conn.add_version(_spec())
        _write(conn, t, np.asarray(data))
        conn.invalidate_cache()

    # Something unreferenced: survivors are written BESIDE the live
    # dir and the CHUNKS pointer flips — the swap mechanics under test.
    orphan(np.arange(8) + 99)
    s1 = vacuum(conn)
    assert s1["chunks_removed"] >= 1
    assert s1["uncommitted_versions_removed"] == 1
    assert conn.chunks_path().endswith("chunks.g0")
    assert conn.fs.exists(os.path.join(conn.path, "CHUNKS"))
    assert not conn.fs.exists(os.path.join(conn.path, "chunks"))
    assert read_all() == before
    orphan(np.arange(8) + 123)
    s2 = vacuum(conn)
    assert conn.chunks_path().endswith("chunks.g1")
    assert read_all() == before
    assert s2["chunks_removed"] >= 1


def test_chunks_path_survives_missing_pointer(spark, tmp_path):
    """Mid-flip simulation: if the CHUNKS pointer is momentarily absent
    (Hadoop replace = delete + rename) after the default dir is gone,
    chunks_path resolves the newest surviving generation instead of
    silently reporting an empty store."""
    store = Store(spark, str(tmp_path))
    conn = store.create_dataset("ds")
    t1 = conn.add_version(_spec())
    _write(conn, t1, np.arange(8))
    conn.finish_version(t1)
    # an abandoned uncommitted write makes the store dirty, so this
    # vacuum actually rewrites and flips (a clean store skips — see
    # test_vacuum_flips_chunk_generations)
    t2 = conn.add_version(_spec())
    _write(conn, t2, np.arange(8) + 99)
    conn.invalidate_cache()
    vacuum(conn)
    assert conn.chunks_path().endswith("chunks.g0")
    os.remove(os.path.join(conn.path, "CHUNKS"))  # the flip window
    assert conn.chunks_path().endswith("chunks.g0")
    tok = reader.on_last_version(conn)
    got = reader.get_slice(conn, tok, "v", sl.mk_slice((0,), (8,)))
    assert got.data.tolist() == list(range(8))


def test_create_exclusive_falls_back_without_hardlinks(tmp_path, monkeypatch):
    """Filesystems without hard-link support (FAT/exFAT, some SMB/FUSE
    mounts) must still commit via O_CREAT|O_EXCL (ADVICE r4): simulate
    os.link raising EPERM and check both the success and the
    already-exists paths."""
    import errno
    import os as _os

    from mandoline_spark.fs import LocalFS

    fs = LocalFS()

    def no_link(src, dst):
        raise OSError(errno.EPERM, "hard links not supported")

    monkeypatch.setattr(_os, "link", no_link)
    p = str(tmp_path / "MARKER")
    assert fs.create_exclusive(p, "one") is True
    assert fs.read_text(p) == "one"
    assert fs.create_exclusive(p, "two") is False
    assert fs.read_text(p) == "one"
    # no staging litter left behind
    assert [f for f in _os.listdir(tmp_path) if f != "MARKER"] == []


def test_memfs_without_mirror_root_never_touches_disk(tmp_path):
    """MemFS is pure-virtual unless a mirror_root is passed (r9 review
    finding): a synthetic catalog root that collides with a REAL
    directory must neither read from it nor — the destructive case —
    rmtree it."""
    import os as _os

    from mandoline_spark.fs import MemFS

    real = tmp_path / "collide"
    (real / "sub").mkdir(parents=True)
    (real / "sub" / "keep.txt").write_text("precious")

    fs = MemFS()
    # a colliding path is invisible...
    assert not fs.exists(str(real))
    assert not fs.isdir(str(real))
    # ...and destroying the virtual path leaves the real one intact
    fs.makedirs(str(real / "virtualdir"))
    fs.write_text(str(real / "virtualdir" / "f"), "x")
    fs.rmtree(str(real))
    assert (real / "sub" / "keep.txt").read_text() == "precious"

    # with the opt-in mirror the union + mirror apply, scoped to it
    scoped = MemFS(mirror_root=str(tmp_path / "owned"))
    owned = tmp_path / "owned" / "ds"
    (owned / "chunks").mkdir(parents=True)
    (owned / "chunks" / "part-0.parquet").write_text("bytes")
    scoped.makedirs(str(owned))
    assert scoped.isdir(str(owned / "chunks"))
    assert scoped.listdir(str(owned / "chunks")) == ["part-0.parquet"]
    # outside the mirror root: still invisible and untouchable
    assert not scoped.exists(str(real))
    scoped.rmtree(str(real))
    assert (real / "sub" / "keep.txt").read_text() == "precious"
    # inside: rmtree mirrors to disk
    scoped.rmtree(str(owned))
    assert not owned.exists()


def test_memfs_mirrored_rename_overwrites_existing_dst(tmp_path):
    """MemFS's disk-mirrored rename keeps the dict rename's overwrite
    semantics (r9 ADVICE): renaming onto an EXISTING non-empty
    directory replaces it, where a raw os.rename would raise — the
    retire/rename-onto-prior-generation path the maintenance flow
    uses."""
    from mandoline_spark.fs import MemFS

    root = tmp_path / "owned"
    fs = MemFS(mirror_root=str(root))

    src = root / "gen-new"
    dst = root / "gen-live"
    (src / "chunks").mkdir(parents=True)
    (src / "chunks" / "a.bin").write_text("new-bytes")
    (dst / "chunks").mkdir(parents=True)
    (dst / "chunks" / "old.bin").write_text("old-bytes")

    fs.rename(str(src), str(dst))
    assert not src.exists()
    assert (dst / "chunks" / "a.bin").read_text() == "new-bytes"
    assert not (dst / "chunks" / "old.bin").exists()

    # file-onto-file replace as well
    (root / "f1").write_text("one")
    (root / "f2").write_text("two")
    fs.rename(str(root / "f1"), str(root / "f2"))
    assert (root / "f2").read_text() == "one"
    assert not (root / "f1").exists()

    # REPLACE is total across both sides (r10 review): dict-side
    # entries under dst must not survive a disk-side rename onto it —
    # otherwise listings union phantom dict files with new disk content
    src2 = root / "gen-2"
    dst2 = root / "gen-live2"
    (src2 / "chunks").mkdir(parents=True)
    (src2 / "chunks" / "b.bin").write_text("disk-bytes")
    fs.makedirs(str(dst2))
    fs.write_text(str(dst2 / "phantom.txt"), "dict-only")
    fs.rename(str(src2), str(dst2))
    assert fs.listdir(str(dst2)) == ["chunks"]
    assert not fs.exists(str(dst2 / "phantom.txt"))

    # and the dict-onto-dict rename replaces too (no merge)
    fs.makedirs(str(root / "m1"))
    fs.write_text(str(root / "m1" / "a"), "A")
    fs.makedirs(str(root / "m2"))
    fs.write_text(str(root / "m2" / "stale"), "S")
    fs.rename(str(root / "m1"), str(root / "m2"))
    assert fs.listdir(str(root / "m2")) == ["a"]

    # dict-only src onto a dst that exists ONLY on disk (r10 ADVICE):
    # the disk subtree must be replaced too, or the union listing
    # merges stale disk files with the new dict content — the mirror
    # image of the phantom-dict case above
    dsk = root / "gen-disk"
    (dsk / "chunks").mkdir(parents=True)
    (dsk / "chunks" / "stale.bin").write_text("stale-disk")
    fs.makedirs(str(root / "gen-dict"))
    fs.write_text(str(root / "gen-dict" / "fresh.txt"), "dict-bytes")
    fs.rename(str(root / "gen-dict"), str(dsk))
    assert fs.listdir(str(dsk)) == ["fresh.txt"]
    assert not (dsk / "chunks").exists()
    assert fs.read_text(str(dsk / "fresh.txt")) == "dict-bytes"

    # dict-only src FILE onto a disk-only dst file replaces as well
    (root / "dfile").write_text("stale")
    fs.write_text(str(root / "memfile"), "fresh")
    fs.rename(str(root / "memfile"), str(root / "dfile"))
    assert fs.read_text(str(root / "dfile")) == "fresh"
    assert not (root / "dfile").exists()  # stale disk side removed
    assert not fs.exists(str(root / "m1"))
