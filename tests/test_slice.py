"""Slice algebra golden cases, ported from the reference's fact tables
(/root/reference/test/io/mandoline/slice_test.clj:8-135)."""

import pytest

from mandoline_spark.core import slice as sl
from mandoline_spark.core.slice import Slice, mk_slice


def test_mk_slice_defaults():
    assert mk_slice([0]) == Slice((0,), (1,), (1,))
    assert mk_slice([0], [2]) == Slice((0,), (2,), (1,))
    assert mk_slice([0], [3], [2]) == Slice((0,), (3,), (2,))
    assert mk_slice([0, 0]) == Slice((0, 0), (1, 1), (1, 1))
    assert mk_slice([1, 1], [2, 2]) == Slice((1, 1), (2, 2), (1, 1))


def test_mk_slice_arity_errors():
    with pytest.raises(ValueError):
        mk_slice([0, 0], [1])
    with pytest.raises(ValueError):
        mk_slice([0, 0], [2, 2], [1, 1, 1])


def test_get_shape():
    assert sl.get_shape(Slice((0, 0), (4, 4), (1, 1))) == (4, 4)
    assert sl.get_shape(Slice((0, 0), (4, 4), (2, 2))) == (2, 2)
    assert sl.get_shape(Slice((0, 0), (5, 4), (2, 2))) == (3, 2)
    with pytest.raises(ValueError):
        sl.get_shape(Slice((5, 4), (0, 0), (1, 1)))


def test_get_intersection():
    a = Slice((500, 300, 0), (550, 330, 20), (1, 1, 1))
    b = Slice((500, 300, 0), (550, 330, 20), (1, 1, 5))
    c = Slice((0, 0, 0), (1051, 813, 365), (1, 1, 1))
    e = Slice((1, 1, 1), (5, 5, 5), (1, 1, 1))
    f = Slice((2, 2, 4), (8, 4, 6), (1, 1, 1))
    l = Slice((1000, 1000), (1200, 1243), (1, 1))
    m = Slice((0, 0), (100, 100), (1, 1))
    n = Slice((), (), ())

    # step must be 1 in all dimensions
    with pytest.raises(ValueError):
        sl.get_intersection(a, b)
    assert sl.get_intersection(a, c) == Slice(
        (500, 300, 0), (550, 330, 20), (1, 1, 1)
    )
    assert sl.get_intersection(e, f) == Slice((2, 2, 4), (5, 4, 5), (1, 1, 1))
    with pytest.raises(ValueError):
        sl.get_intersection(l, m)
    # 0-d slices intersect as themselves
    assert sl.get_intersection(n, n) == n
    assert sl.get_intersection(n, Slice((), (), ())) == n


def test_contains():
    a = Slice((1, 1, 1), (11, 11, 11), (1, 1, 2))
    b = Slice((1, 1, 1), (11, 11, 11), (1, 1, 1))
    c = Slice((0, 0, 0), (11, 11, 11), (1, 1, 1))
    d = Slice((0, 0, 0), (12, 12, 12), (1, 1, 1))
    e = Slice((2, 2, 2), (10, 10, 10), (1, 1, 1))
    f = Slice((), (), ())
    assert sl.contains(a, b)
    assert sl.contains(a, c)
    assert sl.contains(c, d)
    assert sl.contains(a, d)
    assert not sl.contains(a, e)
    assert not sl.contains(a, f)
    assert sl.contains(f, a)
    assert sl.contains(e, b, d)


def test_translate():
    a = Slice((1, 1, 1), (11, 11, 11), (1, 1, 2))
    b = Slice((1, 1, 1), (11, 11, 11), (1, 1, 1))
    c = Slice((0, 0), (10, 10), (1, 1))
    d = Slice((0, 0, 0), (10, 10, 10), (1, 1, 1))
    e = Slice((2, 3, 4), (10, 10, 10), (1, 1, 1))
    f = Slice((3, 4, 5), (11, 11, 11), (1, 1, 1))
    g = Slice((2, 3, 4), (10, 10, 10), (2, 2, 2))
    h = Slice((3, 4, 5), (11, 11, 11), (2, 2, 2))
    i = Slice((0, 0, 0), (10, 10, 10), (1, 1, 2))
    assert sl.translate(a, b) == d
    assert sl.translate(b, a) == i
    with pytest.raises(ValueError):
        sl.translate(b, c)
    assert sl.translate(d, b) == b
    assert sl.translate(b, f) == e
    assert sl.translate(b, h) == g


def test_iter():
    a = Slice((0, 0, 0), (4, 3, 2), (1, 1, 1))
    coords = list(sl.iter_coords(a))
    assert coords[:6] == [
        (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1), (0, 2, 0), (0, 2, 1),
    ]
    assert len(coords) == 24
    assert coords[-1] == (3, 2, 1)


def test_intersect_sorted_vector():
    # slice.clj:61-74 port
    assert sl.intersect_sorted_vector([1, 2, 4, 6], [2, 3, 4, 7]) == [2, 4]
    assert sl.intersect_sorted_vector([], [1]) == []
    assert sl.intersect_sorted_vector([5], [5]) == [5]


def test_get_intersection_general_examples():
    # evens x multiples-of-3 -> multiples of 6
    a = mk_slice((0,), (20,), (2,))
    b = mk_slice((0,), (20,), (3,))
    got = sl.get_intersection_general(a, b)
    assert got == mk_slice((0,), (19,), (6,))
    assert list(range(*got.start, *got.stop, *got.step)) == [0, 6, 12, 18]
    # offset progressions: {1,4,7,...} x {0,2,4,...} -> {4,10,...}
    got = sl.get_intersection_general(
        mk_slice((1,), (20,), (3,)), mk_slice((0,), (20,), (2,))
    )
    assert (got.start, got.step) == ((4,), (6,))
    # disjoint congruence classes raise
    with pytest.raises(ValueError):
        sl.get_intersection_general(
            mk_slice((0,), (20,), (2,)), mk_slice((1,), (20,), (2,))
        )
    # step-1 agrees with the fast path
    a1 = mk_slice((2, 3), (9, 8))
    b1 = mk_slice((0, 5), (7, 12))
    assert sl.get_intersection_general(a1, b1) == sl.get_intersection(a1, b1)


def test_get_intersection_general_matches_bruteforce():
    """Property: the CRT path reproduces the reference's
    get-intersection-slow (materialized range intersection,
    slice.clj:76-102) on every dimension."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dim = st.tuples(
        st.integers(-10, 10),  # start
        st.integers(1, 25),    # extent
        st.integers(1, 7),     # step
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(dim, dim), min_size=1, max_size=3))
    def check(dims):
        a = mk_slice(
            [d[0][0] for d in dims],
            [d[0][0] + d[0][1] for d in dims],
            [d[0][2] for d in dims],
        )
        b = mk_slice(
            [d[1][0] for d in dims],
            [d[1][0] + d[1][1] for d in dims],
            [d[1][2] for d in dims],
        )
        expected = [
            sl.intersect_sorted_vector(
                range(a.start[i], a.stop[i], a.step[i]),
                range(b.start[i], b.stop[i], b.step[i]),
            )
            for i in range(a.ndim)
        ]
        if all(e for e in expected):
            got = sl.get_intersection_general(a, b)
            if a == b:
                # reference shortcut (slice.clj:88): a == b returns a
                # verbatim, without [min, max+1) normalization — the
                # element set is identical either way
                assert got == a
                return
            for i, e in enumerate(expected):
                assert got.start[i] == min(e)
                assert got.stop[i] == max(e) + 1
                assert got.step[i] == (
                    a.step[i] * b.step[i]
                    // __import__("math").gcd(a.step[i], b.step[i])
                )
                # the declared AP reproduces the exact element set
                assert (
                    list(range(got.start[i], got.stop[i], got.step[i])) == e
                )
        else:
            with pytest.raises(ValueError):
                sl.get_intersection_general(a, b)

    check()
