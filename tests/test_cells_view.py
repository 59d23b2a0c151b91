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


def test_register_cells_views_sql(store):
    """The §1.4 SQL bridge end-to-end: register the cell views, then
    join array cells against a relational temp table with plain
    spark.sql."""
    import numpy as np

    from mandoline_spark import reader, writer
    from mandoline_spark.core import slab as sb
    from mandoline_spark.core import slice as sl

    conn = store.create_dataset("ds_sql")
    dds = {
        "dimensions": {"x": 6, "y": 4},
        "chunk-dimensions": {"x": 3, "y": 2},
        "variables": {
            "t": {"type": "int", "shape": ["x", "y"], "fill-value": -1},
            "u": {"type": "double", "shape": ["x"], "fill-value": 0.0},
        },
    }
    tok = conn.add_version(dds)
    a = np.arange(24, dtype=np.int32).reshape(6, 4)
    writer.write_variable(
        conn, tok, "t", [sb.Slab(a, sl.mk_slice((0, 0), (6, 4)))]
    )
    u = np.linspace(0.0, 1.0, 6)
    writer.write_variable(
        conn, tok, "u", [sb.Slab(u, sl.mk_slice((0,), (6,)))]
    )
    conn.finish_version(tok)

    token = reader.on_last_version(conn)
    names = reader.register_cells_views(conn, token)
    assert names == ["cells_t", "cells_u"]

    spark = store.spark
    spark.createDataFrame(
        [(i, f"row{i}") for i in range(6)], "x int, label string"
    ).createOrReplaceTempView("dims")
    got = spark.sql(
        """SELECT d.label, CAST(sum(c.value) AS BIGINT) AS s,
                  round(max(w.value), 6) AS wmax
           FROM cells_t c JOIN dims d ON c.x = d.x
           JOIN cells_u w ON w.x = c.x
           GROUP BY d.label ORDER BY d.label"""
    ).collect()
    assert len(got) == 6
    for i, r in enumerate(got):
        assert r.label == f"row{i}"
        assert r.s == int(a[i].sum())
        assert abs(r.wmax - u[i]) < 1e-9
