"""instrument!/all-metrics parity (mandoline.clj:312-321,
utils.clj:15-32): timers wrap the hot entry points, are named
[namespace function "time"], accumulate counts/durations, and can be
removed again."""

from __future__ import annotations

import numpy as np

from mandoline_spark import metrics, reader, writer
from mandoline_spark.core import slab as sb
from mandoline_spark.core import slice as sl


def _mkds(store):
    conn = store.create_dataset("m")
    tok = conn.add_version(
        {
            "dimensions": {"x": 6},
            "chunk-dimensions": {"x": 3},
            "variables": {
                "v": {"type": "int", "shape": ["x"], "fill-value": 0}
            },
        }
    )
    writer.write_variable(
        conn, tok, "v", [sb.empty("int", sl.mk_slice((0,), (6,)), 4)]
    )
    conn.finish_version(tok)
    return conn


def test_instrument_times_read_write(store):
    metrics.reset_metrics()
    names = metrics.instrument()
    try:
        assert "mandoline_spark.reader.get_slice.time" in names
        conn = _mkds(store)
        got = reader.get_slice(
            conn, reader.on_last_version(conn), "v", sl.mk_slice((0,), (6,))
        )
        np.testing.assert_array_equal(got.data, np.full(6, 4, np.int32))

        m = metrics.all_metrics()
        # write + read paths both recorded
        wv = m["mandoline_spark.writer.write_variable.time"]
        gs = m["mandoline_spark.reader.get_slice.time"]
        lv = m["mandoline_spark.store.Connection.last_version.time"]
        assert wv["count"] == 1 and wv["total_s"] > 0
        assert gs["count"] == 1 and gs["max_s"] >= gs["min_s"] > 0
        assert lv["count"] >= 1
        assert gs["mean_s"] <= gs["total_s"]
    finally:
        metrics.uninstrument()


def test_strided_read_counts_once(store):
    """get_slice with step>1 recurses through the module global for its
    bounding-box read; the wrapper's reentrancy guard must count that
    as ONE user-level call, not two nested timings."""
    metrics.reset_metrics()
    metrics.instrument()
    try:
        conn = _mkds(store)
        got = reader.get_slice(
            conn,
            reader.on_last_version(conn),
            "v",
            sl.Slice((0,), (6,), (2,)),
        )
        np.testing.assert_array_equal(got.data, np.full(3, 4, np.int16))
        gs = metrics.all_metrics()["mandoline_spark.reader.get_slice.time"]
        assert gs["count"] == 1, gs
    finally:
        metrics.uninstrument()
        metrics.reset_metrics()


def test_instrument_idempotent_and_removable(store):
    metrics.reset_metrics()
    orig = writer.write_variable
    metrics.instrument()
    first = writer.write_variable
    metrics.instrument()  # idempotent: no double-wrap
    assert writer.write_variable is first
    assert first.__wrapped__ is orig
    metrics.uninstrument()
    assert writer.write_variable is orig

    # counts survive uninstrument until an explicit reset
    metrics.instrument()
    conn = _mkds(store)
    metrics.uninstrument()
    assert (
        metrics.all_metrics()["mandoline_spark.writer.write_variable.time"][
            "count"
        ]
        == 1
    )
    assert conn.last_version() is not None
    metrics.reset_metrics()
    assert metrics.all_metrics() == {}
