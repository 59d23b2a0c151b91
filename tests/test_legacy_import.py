"""End-to-end legacy-store migration: reference-format chunk dump
(chain-enveloped, big-endian cells) → distributed decode → versioned
store → reads equal the numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from mandoline_spark import reader
from mandoline_spark.core import slice as sl
from mandoline_spark.filters import chain_apply
from mandoline_spark.sources.legacy_import import import_legacy_chunks

SPEC = {
    "dimensions": {"x": 10, "y": 7},
    "chunk-dimensions": {"x": 4, "y": 3},
    "variables": {
        "v": {"type": "short", "shape": ["x", "y"], "fill-value": -3},
        "w": {"type": "double", "shape": ["x", "y"], "fill-value": float("nan")},
    },
}


def _legacy_dump(arr: np.ndarray, cx: int, cy: int, fill):
    """Chunk `arr` the reference way: full tiles, fill beyond extent,
    big-endian cell bytes, lz4 chain envelope."""
    X, Y = arr.shape
    rows = []
    for i in range(-(-X // cx)):
        for j in range(-(-Y // cy)):
            tile = np.full((cx, cy), fill, dtype=arr.dtype)
            sub = arr[i * cx : (i + 1) * cx, j * cy : (j + 1) * cy]
            tile[: sub.shape[0], : sub.shape[1]] = sub
            be = tile.astype(tile.dtype.newbyteorder(">")).tobytes()
            rows.append(([i, j], bytearray(chain_apply(be, ["lz4"]))))
    return rows


def test_import_legacy_chunks_roundtrip(store):
    rng = np.random.default_rng(3)
    a = rng.integers(-500, 500, (10, 7)).astype(np.int16)
    b = rng.normal(size=(10, 7))

    spark = store.spark
    va = spark.createDataFrame(
        _legacy_dump(a, 4, 3, -3), "coord array<int>, blob binary"
    )
    vb = spark.createDataFrame(
        _legacy_dump(b, 4, 3, np.nan), "coord array<int>, blob binary"
    )
    conn = import_legacy_chunks(
        store, "legacy", SPEC, {"v": va, "w": vb}
    )
    token = reader.on_last_version(conn)
    got_a = reader.get_slice(
        conn, token, "v", sl.mk_slice((0, 0), (10, 7))
    )
    np.testing.assert_array_equal(got_a.data, a)
    got_b = reader.get_slice(
        conn, token, "w", sl.mk_slice((2, 1), (9, 6))
    )
    np.testing.assert_allclose(got_b.data, b[2:9, 1:6])


def test_import_legacy_rejects_bad_coord(store):
    va = store.spark.createDataFrame(
        [([0, 0, 0], bytearray(chain_apply(b"\x00" * 24, ["lz4"])))],
        "coord array<int>, blob binary",
    )
    with pytest.raises(Exception):
        import_legacy_chunks(
            store, "legacy2", SPEC, {"v": va}
        )


def test_legacy_import_property_types(store):
    """Every reference element type round-trips through the legacy
    envelope (big-endian + lz4 chain) back to the numpy oracle."""
    rng = np.random.default_rng(11)
    cases = {
        "byte": rng.integers(-128, 127, (5, 4)).astype(np.int8),
        "short": rng.integers(-500, 500, (5, 4)).astype(np.int16),
        "int": rng.integers(-5000, 5000, (5, 4)).astype(np.int32),
        "long": rng.integers(-9000, 9000, (5, 4)).astype(np.int64),
        "float": rng.normal(size=(5, 4)).astype(np.float32),
        "double": rng.normal(size=(5, 4)),
    }
    spec = {
        "dimensions": {"x": 5, "y": 4},
        "chunk-dimensions": {"x": 2, "y": 3},
        "variables": {
            f"v_{t}": {"type": t, "shape": ["x", "y"], "fill-value": 0}
            for t in cases
        },
    }
    dumps = {
        f"v_{t}": store.spark.createDataFrame(
            _legacy_dump(arr, 2, 3, 0), "coord array<int>, blob binary"
        )
        for t, arr in cases.items()
    }
    conn = import_legacy_chunks(store, "legacy_types", spec, dumps)
    token = reader.on_last_version(conn)
    for t, arr in cases.items():
        got = reader.get_slice(
            conn, token, f"v_{t}", sl.mk_slice((0, 0), (5, 4))
        )
        np.testing.assert_array_equal(got.data, arr)
