"""The exploded cell view (reader.cells_df, SURVEY §1.4) vs a numpy
oracle: stored values, synthesized fill for absent chunks, request
clipping, and version pinning."""

from __future__ import annotations

import numpy as np

from mandoline_spark import reader, writer
from mandoline_spark.core import slab as sb
from mandoline_spark.core import slice as sl

DDS = {
    "dimensions": {"x": 9, "y": 7},
    "chunk-dimensions": {"x": 4, "y": 3},
    "variables": {
        "v": {"type": "int", "shape": ["x", "y"], "fill-value": -5}
    },
}


def _cells_to_array(rows, shape, fill):
    out = np.full(shape, fill, np.int64)
    seen = np.zeros(shape, bool)
    for r in rows:
        out[r["dim0"], r["dim1"]] = r["value"]
        assert not seen[r["dim0"], r["dim1"]], "duplicate cell"
        seen[r["dim0"], r["dim1"]] = True
    assert seen.all(), "missing cells"
    return out


def test_cells_full_extent_with_fill(store):
    conn = store.create_dataset("ds")
    t = conn.add_version(DDS)
    rng = np.random.default_rng(3)
    a = rng.integers(-99, 99, (5, 4)).astype(np.int32)
    writer.write_variable(
        conn, t, "v", [sb.Slab(a, sl.mk_slice((2, 1), (7, 5)))]
    )
    v1 = conn.finish_version(t)

    token = reader.on_version(conn, v1)
    rows = reader.cells_df(conn, token, "v").collect()
    assert len(rows) == 9 * 7
    oracle = np.full((9, 7), -5, np.int64)
    oracle[2:7, 1:5] = a
    np.testing.assert_array_equal(
        _cells_to_array(rows, (9, 7), -5), oracle
    )


def test_cells_request_clipping_and_versions(store):
    conn = store.create_dataset("ds")
    t1 = conn.add_version(DDS)
    writer.write_variable(
        conn, t1, "v",
        [sb.empty("int", sl.mk_slice((0, 0), (9, 7)), 1)],
    )
    v1 = conn.finish_version(t1)
    t2 = conn.add_version(DDS)
    writer.write_variable(
        conn, t2, "v",
        [sb.empty("int", sl.mk_slice((3, 3), (5, 5)), 2)],
    )
    v2 = conn.finish_version(t2)

    req = sl.mk_slice((2, 2), (6, 6))
    rows1 = reader.cells_df(conn, reader.on_version(conn, v1), "v", req).collect()
    assert len(rows1) == 16
    assert all(r["value"] == 1 for r in rows1)
    assert all(2 <= r["dim0"] < 6 and 2 <= r["dim1"] < 6 for r in rows1)

    rows2 = reader.cells_df(conn, reader.on_version(conn, v2), "v", req).collect()
    vals = {(r["dim0"], r["dim1"]): r["value"] for r in rows2}
    for (x, y), v in vals.items():
        assert v == (2 if 3 <= x < 5 and 3 <= y < 5 else 1)


def test_cells_sql_registration(store, spark):
    """The cell view joins/aggregates as an ordinary SQL relation."""
    conn = store.create_dataset("ds")
    t = conn.add_version(DDS)
    writer.write_variable(
        conn, t, "v", [sb.empty("int", sl.mk_slice((0, 0), (9, 7)), 3)]
    )
    conn.finish_version(t)
    cells = reader.cells_df(conn, reader.on_last_version(conn), "v")
    cells.createOrReplaceTempView("cells_v")
    got = spark.sql(
        "SELECT dim0, sum(value) AS s FROM cells_v GROUP BY dim0 ORDER BY dim0"
    ).collect()
    assert [r["s"] for r in got] == [21] * 9
