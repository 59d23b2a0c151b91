"""ndarray → versioned store import (the NetCDF/Zarr path minus the
optional xarray front-end)."""

from __future__ import annotations

import numpy as np
import pytest

from mandoline_spark import reader
from mandoline_spark.core import slice as sl
from mandoline_spark.sources.ndarray_import import (
    import_arrays,
    import_xarray,
    spec_from_arrays,
)


def test_spec_inference():
    arrays = {
        "temp": np.zeros((10, 20), np.float32),
        "mask": np.zeros((10,), np.int8),
    }
    spec = spec_from_arrays(
        arrays,
        {"temp": ["lat", "lon"], "mask": ["lat"]},
        {"lat": 4, "lon": 64},
    )
    assert spec["dimensions"] == {"lat": 10, "lon": 20}
    assert spec["chunk-dimensions"] == {"lat": 4, "lon": 20}  # clamped
    assert spec["variables"]["temp"]["type"] == "float"
    assert np.isnan(spec["variables"]["temp"]["fill-value"])
    assert spec["variables"]["mask"] == {
        "type": "byte",
        "shape": ["lat"],
        "fill-value": 0,
    }


def test_spec_conflicting_dims_rejected():
    with pytest.raises(ValueError, match="conflicting"):
        spec_from_arrays(
            {"a": np.zeros((5,), np.int32), "b": np.zeros((6,), np.int32)},
            {"a": ["x"], "b": ["x"]},
            {},
        )


def test_import_roundtrip(store):
    rng = np.random.default_rng(21)
    temp = rng.uniform(-30, 40, (12, 9)).astype(np.float32)
    count = rng.integers(0, 100, (12,)).astype(np.int64)
    conn = import_arrays(
        store,
        "weather",
        {"temp": temp, "count": count},
        {"temp": ["t", "station"], "count": ["t"]},
        {"t": 5, "station": 4},
    )
    tok = reader.on_last_version(conn)
    got_t = reader.get_slice(conn, tok, "temp", sl.mk_slice((0, 0), (12, 9)))
    np.testing.assert_array_equal(got_t.data, temp)
    got_c = reader.get_slice(conn, tok, "count", sl.mk_slice((0,), (12,)))
    np.testing.assert_array_equal(got_c.data, count)


def test_xarray_gate_gives_guidance(store):
    class FakeXr:  # anything; the import gate fires first
        data_vars = {}

    try:
        import xarray  # noqa: F401

        pytest.skip("xarray present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="xarray is required"):
        import_xarray(store, "ds", FakeXr())


def test_export_arrays_roundtrip(spark, store):
    """import → export round-trips every variable bit for bit, and a
    version token pins the export for time travel."""
    import numpy as np

    from mandoline_spark import reader
    from mandoline_spark.sources.ndarray_import import (
        export_arrays,
        import_arrays,
    )

    t = np.arange(24, dtype=np.int32).reshape(4, 6)
    p = np.linspace(0, 1, 24).reshape(4, 6)
    conn = import_arrays(
        store, "rt", {"t": t, "p": p},
        {"t": ["x", "y"], "p": ["x", "y"]}, {"x": 2, "y": 3},
    )
    got = export_arrays(conn)
    assert (got["t"] == t).all()
    np.testing.assert_array_equal(got["p"], p)

    # a second version overwrites a corner; the old token still exports
    # the original
    tok0 = reader.on_nth_version(conn, 0)
    spec = conn.metadata()
    tk = conn.add_version(spec)
    from mandoline_spark import writer
    from mandoline_spark.core import slab as sb
    from mandoline_spark.core import slice as sl

    writer.write_variable(
        conn, tk, "t",
        [sb.Slab(np.full((2, 2), 99, np.int32), sl.mk_slice((0, 0), (2, 2)))],
    )
    conn.finish_version(tk)
    new = export_arrays(conn)["t"]
    assert new[0, 0] == 99 and new[3, 5] == t[3, 5]
    old = export_arrays(conn, tok0)["t"]
    assert (old == t).all()
