"""Slab algebra golden cases, ported from
/root/reference/test/io/mandoline/slab_test.clj:12-145."""

import numpy as np
import pytest

from mandoline_spark.core import slab as sb
from mandoline_spark.core import slice as sl
from mandoline_spark.core.slab import Slab
from mandoline_spark.core.slice import Slice, mk_slice


def to_slab(type_name, s, values):
    data = np.array(values, dtype=sb.as_dtype(type_name)).reshape(
        sl.get_shape(s)
    )
    return Slab(data, s)


def same_slab(type_name, s, fill):
    return sb.empty(type_name, s, fill)


def assert_same(a: Slab, b: Slab):
    assert a.slice == b.slice
    np.testing.assert_array_equal(a.data, b.data)
    assert a.data.dtype == b.data.dtype


X_VALUES = [1, 2, 3, 4, 5, 2, 3, 4, 5, 6, 3, 4, 5, 6, 7,
            4, 5, 6, 7, 8, 5, 6, 7, 8, 9, 6, 7, 8, 9, 0]
X_SLICE = mk_slice([7, 3], [13, 8])


def test_empty():
    a = sb.empty("int", Slice((1, 1, 1), (6, 7, 8), (1, 1, 1)))
    assert a.data.shape == (5, 6, 7)
    assert (a.data == 0).all()
    assert a.data.dtype == np.int32
    b = sb.empty("short", mk_slice([0, 0], [100, 2]), -1)
    assert b.data.shape == (100, 2)
    assert (b.data == -1).all()
    assert b.data.dtype == np.int16


def test_subset():
    x = to_slab("short", X_SLICE, X_VALUES)
    u_slice = Slice((7, 3), (10, 5), (1, 1))
    u = to_slab("short", u_slice, [1, 2, 2, 3, 3, 4])
    v_slice = Slice((8, 4), (12, 6), (2, 1))
    v = to_slab("short", v_slice, [3, 4, 5, 6])
    w_slice = Slice((7, 3), (9, 7), (2, 2))
    w = to_slab("short", w_slice, [1, 3])

    assert_same(sb.subset(x, u_slice), u)
    assert_same(sb.subset(x, v_slice), v)
    assert_same(sb.subset(x, w_slice), w)
    with pytest.raises(ValueError):
        sb.subset(x, Slice((0, 0), (2, 3), (1, 1)))
    # a strided slab cannot be re-subset
    z = Slab(
        np.array(X_VALUES, dtype=np.int16).reshape(6, 5),
        mk_slice([0, 0], [12, 10], [2, 2]),
    )
    with pytest.raises(ValueError):
        sb.subset(z, v_slice)


def test_subset_is_view():
    x = to_slab("short", X_SLICE, X_VALUES)
    u = sb.subset(x, Slice((7, 3), (10, 5), (1, 1)))
    u.data[0, 0] = 42
    assert x.data[0, 0] == 42


def test_intersect():
    x = to_slab("short", X_SLICE, X_VALUES)
    u = to_slab("short", Slice((7, 3), (10, 5), (1, 1)), [1, 2, 2, 3, 3, 4])
    assert_same(sb.intersect(x, mk_slice([0, 0], [10, 5])), u)
    z = to_slab("short", Slice((0, 0, 0), (1, 2, 3), (1, 1, 1)),
                [1, 1, 2, 2, 3, 3])
    with pytest.raises(ValueError):
        sb.intersect(z, Slice((0, 0), (2, 3), (1, 1)))


def test_copy_into():
    def fresh_x():
        return to_slab("short", X_SLICE, X_VALUES)

    u = same_slab("short", mk_slice([7, 3], [10, 5]), -1)
    uu = to_slab("short", X_SLICE,
                 [-1, -1, 3, 4, 5, -1, -1, 4, 5, 6, -1, -1, 5, 6, 7,
                  4, 5, 6, 7, 8, 5, 6, 7, 8, 9, 6, 7, 8, 9, 0])
    v_slice = Slice((8, 4), (12, 6), (2, 1))
    v = same_slab("short", v_slice, -2)
    vv = to_slab("short", X_SLICE,
                 [1, 2, 3, 4, 5, 2, -2, -2, 5, 6, 3, 4, 5, 6, 7,
                  4, -2, -2, 7, 8, 5, 6, 7, 8, 9, 6, 7, 8, 9, 0])

    assert_same(sb.copy_into(u, fresh_x()), uu)
    assert_same(sb.copy_into(v, fresh_x()), vv)
    with pytest.raises(ValueError):  # dtype mismatch
        sb.copy_into(same_slab("int", v_slice, -2), fresh_x())
    with pytest.raises(ValueError):  # not contained
        sb.copy_into(
            same_slab("short", Slice((0, 0), (2, 2), (1, 1)), -1), fresh_x()
        )


def test_merge():
    x = to_slab("short", mk_slice([0, 0], [3, 5]),
                [1, 2, 3, 4, 5, 2, 3, 4, 5, 6, 3, 4, 5, 6, 7])
    y = to_slab("short", mk_slice([3, 0], [7, 5]),
                [4, 5, 6, 7, 8, 5, 6, 7, 8, 9, 6, 7, 8, 9, 0,
                 1, 1, 1, 1, 1])
    z_slice = mk_slice([0, 0], [6, 5])
    z = to_slab("short", z_slice, X_VALUES)
    xx = to_slab("short", z_slice,
                 [1, 2, 3, 4, 5, 2, 3, 4, 5, 6, 3, 4, 5, 6, 7] + [-1] * 15)
    yy = to_slab("short", z_slice,
                 [-1] * 15 + [4, 5, 6, 7, 8, 5, 6, 7, 8, 9, 6, 7, 8, 9, 0])

    assert_same(sb.merge(sb.empty("short", z_slice, -1), x), xx)
    assert_same(sb.merge(sb.empty("short", z_slice, -1), y), yy)
    dst = sb.empty("short", z_slice, -1)
    for s in (x, y):
        dst = sb.merge(dst, s)
    assert_same(dst, z)


def test_scalar_slab_roundtrip():
    s = Slice((), (), ())
    a = sb.empty("int", s, 7)
    assert a.data.shape == ()
    assert a.data[()] == 7
    b = sb.from_bytes(sb.to_bytes(a), "int", s)
    assert b.data[()] == 7


def test_bytes_roundtrip_all_types():
    s = mk_slice([0, 0], [3, 4])
    rng = np.random.default_rng(42)
    for name, dtype in sb.DTYPES.items():
        if dtype.kind == "f":
            data = rng.normal(size=(3, 4)).astype(dtype)
            data[0, 0] = np.nan
        else:
            data = rng.integers(0, 100, size=(3, 4)).astype(dtype)
        slab = Slab(data, s)
        back = sb.from_bytes(sb.to_bytes(slab), name, s)
        np.testing.assert_array_equal(
            np.nan_to_num(back.data), np.nan_to_num(data)
        )
