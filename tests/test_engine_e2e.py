"""Minimum end-to-end slice (SURVEY §7.2) + core read/write behavior.

Scenario mirrors the reference's tutorial flow (README.md:254-472):
create → add_version → write slabs → finish_version → get_slice equals
the numpy oracle; overwrite in v2; both versions readable (semantics of
test/overwrite.clj, entire_flow.clj).
"""

from __future__ import annotations

import numpy as np
import pytest

from mandoline_spark import reader, writer
from mandoline_spark.core import slab as sb
from mandoline_spark.core import slice as sl

FOOBAR = {
    "dimensions": {"x": 10, "y": 11, "time": 13},
    "chunk-dimensions": {"x": 2, "y": 2, "time": 2},
    "variables": {
        "foo": {"type": "short", "shape": ["x", "y", "time"], "fill-value": -3},
    },
}


def _slab(arr, start):
    arr = np.asarray(arr)
    stop = tuple(s + n for s, n in zip(start, arr.shape))
    return sb.Slab(arr, sl.mk_slice(start, stop))


def test_write_read_roundtrip(store):
    conn = store.create_dataset("ds")
    token = conn.add_version(FOOBAR)

    rng = np.random.default_rng(42)
    a = rng.integers(-500, 500, (4, 5, 6)).astype(np.int16)
    writer.write_variable(conn, token, "foo", [_slab(a, (2, 3, 4))])
    conn.finish_version(token)

    t = reader.on_last_version(conn)

    # exact region back
    got = reader.get_slice(conn, t, "foo", sl.mk_slice((2, 3, 4), (6, 8, 10)))
    assert np.array_equal(got.data, a)

    # full extent: fill everywhere else
    full = reader.get_slice(conn, t, "foo", sl.mk_slice((0, 0, 0), (10, 11, 13)))
    oracle = np.full((10, 11, 13), -3, dtype=np.int16)
    oracle[2:6, 3:8, 4:10] = a
    assert np.array_equal(full.data, oracle)

    # out-of-bounds read throws
    with pytest.raises(IndexError):
        reader.get_slice(conn, t, "foo", sl.mk_slice((0, 0, 0), (11, 11, 13)))


def test_overwrite_two_versions(store):
    conn = store.create_dataset("ds")
    token = conn.add_version(FOOBAR)
    base = np.arange(10 * 11 * 13, dtype=np.int16).reshape(10, 11, 13)
    writer.write_variable(conn, token, "foo", [_slab(base, (0, 0, 0))])
    v1 = conn.finish_version(token)

    token2 = conn.add_version(FOOBAR)
    patch = np.full((1, 1, 1), 9999, dtype=np.int16)
    writer.write_variable(conn, token2, "foo", [_slab(patch, (4, 4, 4))])
    v2 = conn.finish_version(token2)

    req = sl.mk_slice((0, 0, 0), (10, 11, 13))
    got1 = reader.get_slice(conn, reader.on_version(conn, v1), "foo", req)
    assert np.array_equal(got1.data, base)

    oracle2 = base.copy()
    oracle2[4, 4, 4] = 9999
    got2 = reader.get_slice(conn, reader.on_version(conn, v2), "foo", req)
    assert np.array_equal(got2.data, oracle2)

    # time travel equals version pin
    got_ts = reader.get_slice(
        conn, reader.on_timestamp(conn, v1), "foo", req
    )
    assert np.array_equal(got_ts.data, base)
    got_nth = reader.get_slice(
        conn, reader.on_nth_version(conn, 0), "foo", req
    )
    assert np.array_equal(got_nth.data, base)


def test_overlapping_slabs_last_writer_wins(store):
    conn = store.create_dataset("ds")
    token = conn.add_version(FOOBAR)
    rng = np.random.default_rng(7)
    slabs = []
    oracle = np.full((10, 11, 13), -3, dtype=np.int16)
    for _ in range(9):
        x, y, t = rng.integers(0, 7, 3)
        vals = rng.integers(-100, 100, (3, 3, 3)).astype(np.int16)
        slabs.append(_slab(vals, (int(x), int(y), int(t))))
        oracle[x : x + 3, y : y + 3, t : t + 3] = vals
    writer.write_variable(conn, token, "foo", slabs)
    conn.finish_version(token)

    got = reader.get_slice(
        conn,
        reader.on_last_version(conn),
        "foo",
        sl.mk_slice((0, 0, 0), (10, 11, 13)),
    )
    assert np.array_equal(got.data, oracle)


def test_scalar_variable(store):
    spec = {
        "dimensions": {"x": 10},
        "chunk-dimensions": {"x": 2},
        "variables": {
            "s": {"type": "int", "shape": [], "fill-value": 0},
        },
    }
    conn = store.create_dataset("ds")
    token = conn.add_version(spec)
    zero_d = sb.Slab(np.array(42, dtype=np.int32), sl.mk_slice((), ()))
    writer.write_variable(conn, token, "s", [zero_d])
    conn.finish_version(token)
    got = reader.get_slice(
        conn, reader.on_last_version(conn), "s", sl.mk_slice((), ())
    )
    assert got.data[()] == 42


def test_unwritten_variable_reads_fill(store):
    conn = store.create_dataset("ds")
    token = conn.add_version(FOOBAR)
    # commit with no writes at all
    conn.finish_version(token)
    got = reader.get_slice(
        conn,
        reader.on_last_version(conn),
        "foo",
        sl.mk_slice((0, 0, 0), (3, 3, 3)),
    )
    assert np.array_equal(got.data, np.full((3, 3, 3), -3, dtype=np.int16))


def test_strided_read_matches_numpy(store):
    """Strided get_slice (step>1): pruned bounding-box read +
    driver-side subsample equals the numpy oracle — the capability the
    reference's deprecated get-intersection-slow gestured at
    (slice.clj:76-102) but never shipped in its read path."""
    conn = store.create_dataset("ds")
    token = conn.add_version(FOOBAR)
    rng = np.random.default_rng(7)
    a = rng.integers(-500, 500, (10, 11, 13)).astype(np.int16)
    writer.write_variable(conn, token, "foo", [_slab(a, (0, 0, 0))])
    conn.finish_version(token)

    rt = reader.on_last_version(conn)
    req = sl.mk_slice((1, 0, 2), (9, 11, 13), (3, 2, 4))
    got = reader.get_slice(conn, rt, "foo", req)
    np.testing.assert_array_equal(got.data, a[1:9:3, 0:11:2, 2:13:4])
    assert got.slice == req
    # step=0 / negative steps are rejected loudly
    with pytest.raises(ValueError):
        reader.get_slice(
            conn, rt, "foo", sl.Slice((0, 0, 0), (5, 5, 5), (1, 0, 1))
        )
