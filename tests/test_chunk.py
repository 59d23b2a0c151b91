"""Chunk coordinate + content-id golden cases, ported from
/root/reference/test/io/mandoline/chunk_test.clj:11-47."""

import numpy as np

from mandoline_spark.core import chunk as ck
from mandoline_spark.core import slab as sb
from mandoline_spark.core.slab import Slab
from mandoline_spark.core.slice import Slice, mk_slice


def test_to_chunk_coordinates():
    a = Slice((500, 300, 0), (550, 330, 20), (50, 50, 50))
    b = Slice((500, 300, 0), (551, 330, 20), (50, 50, 50))
    c = Slice((500, 300, 100), (520, 310, 120), (20, 20, 20))
    d = Slice((500, 300, 0), (520, 310, 120), (20, 20, 20))
    e = Slice((501, 300, 0), (520, 310, 120), (20, 20, 20))
    assert list(ck.to_chunk_coordinates(a, a)) == [(10, 6, 0)]
    assert list(ck.to_chunk_coordinates(b, b)) == [(10, 6, 0), (11, 6, 0)]
    assert list(ck.to_chunk_coordinates(c, c)) == [(25, 15, 5)]
    assert list(ck.to_chunk_coordinates(c, a)) == [(10, 6, 2)]
    assert list(ck.to_chunk_coordinates(d, d)) == [
        (25, 15, 0), (25, 15, 1), (25, 15, 2),
        (25, 15, 3), (25, 15, 4), (25, 15, 5),
    ]
    assert list(ck.to_chunk_coordinates(d, a)) == [
        (10, 6, 0), (10, 6, 1), (10, 6, 2)
    ]
    assert list(ck.to_chunk_coordinates(e, e)) == [
        (25, 15, 0), (25, 15, 1), (25, 15, 2),
        (25, 15, 3), (25, 15, 4), (25, 15, 5),
    ]


def test_from_chunk_coordinate():
    a = Slice((0, 0, 0), (1051, 813, 20), (50, 50, 50))
    assert ck.from_chunk_coordinate(a, (0, 0, 0)) == Slice(
        (0, 0, 0), (50, 50, 50), (1, 1, 1)
    )
    assert ck.from_chunk_coordinate(a, (0, 1, 2)) == Slice(
        (0, 50, 100), (50, 100, 150), (1, 1, 1)
    )


def test_chunk_coordinate_ranges():
    s = mk_slice([5, 0], [21, 7])
    grid = Slice((0, 0), (30, 30), (10, 5))
    assert ck.chunk_coordinate_ranges(s, grid) == [(0, 2), (0, 1)]


def test_generate_id():
    s = mk_slice([0, 0], [10, 10])
    a = Slab(np.tile(np.arange(10, dtype=np.int64), (10, 1)), s)
    b = Slab(np.tile(np.arange(1, 11, dtype=np.int64), (10, 1)), s)
    ida, idb = ck.generate_id(a), ck.generate_id(b)
    assert isinstance(ida, str) and len(ida) == 40
    assert ida != idb
    # content addressing: same cells, separately-built array → same id
    a2 = Slab(np.tile(np.arange(10, dtype=np.int64), (10, 1)), s)
    assert ck.generate_id(a2) == ida


def test_chunk_coordinate_sets_match_enumeration_oracle():
    """Property (hypothesis): for any strided slice, the per-dimension
    (lo, hi, vals) sets are a SUPERSET of the exact touched-coordinate
    enumeration (to_chunk_coordinates), are EXACT whenever vals is
    explicit, and the [lo, hi] bound is tight to the lattice extent
    (r9 review: hi derived from stop-1 overcounted sparse strides)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(data=st.data())
    def run(data):
        ndim = data.draw(st.integers(1, 3))
        dims, starts, stops, steps, chunks = [], [], [], [], []
        for _ in range(ndim):
            d = data.draw(st.integers(2, 60))
            a = data.draw(st.integers(0, d - 1))
            b = data.draw(st.integers(a + 1, d))
            starts.append(a)
            stops.append(b)
            steps.append(data.draw(st.integers(1, 15)))
            chunks.append(data.draw(st.integers(1, 12)))
        s = Slice(tuple(starts), tuple(stops), tuple(steps))
        grid = Slice(
            tuple(0 for _ in chunks),
            tuple(c * 10 for c in chunks),
            tuple(chunks),
        )
        exact = set(ck.to_chunk_coordinates(s, grid))
        csets = ck.chunk_coordinate_sets(s, grid)
        per_dim_exact = [
            sorted({c[i] for c in exact}) for i in range(ndim)
        ]
        for (lo, hi, vals), dim_exact in zip(csets, per_dim_exact):
            # tight bounds in every branch
            assert lo == dim_exact[0] and hi == dim_exact[-1]
            if vals is not None:
                assert list(vals) == dim_exact  # exact IN-set
            else:
                # dense claim: a superset that stays within the bound
                assert set(dim_exact) <= set(range(lo, hi + 1))
        # and the product of the sets covers every touched coordinate
        import itertools

        covered = set(
            itertools.product(
                *[
                    vals if vals is not None else range(lo, hi + 1)
                    for lo, hi, vals in csets
                ]
            )
        )
        assert exact <= covered

        # same slice through a tiny literal budget: whatever spills
        # past max_in must arrive as a ModSet that is still EXACT
        # (r10 — the modular predicate that replaced the r9 cliff)
        tiny = ck.chunk_coordinate_sets(s, grid, max_in=2)
        for (lo, hi, vals), dim_exact in zip(tiny, per_dim_exact):
            assert lo == dim_exact[0] and hi == dim_exact[-1]
            if isinstance(vals, ck.ModSet):
                assert list(vals) == dim_exact
                assert len(vals) == len(dim_exact)
                assert all(v in vals for v in dim_exact)
                assert not any(
                    h in vals
                    for h in range(lo, hi + 1)
                    if h not in set(dim_exact)
                )

    run()


def test_branch_handoffs_at_st_near_c_and_npts_near_max_in():
    """Property (hypothesis): the three value shapes the consumers'
    contract allows — None (dense BETWEEN), tuple (exact IN), ModSet
    (exact modular) — hand off exactly where documented, swept across
    the two boundaries at once: st ∈ {c-1, c, c+1} (the dense↔sparse
    edge; ModSet's exactness proof needs st > c) × npts ∈ {max_in-1,
    max_in, max_in+1} (the IN↔ModSet literal budget).  Every shape is
    checked against the enumeration oracle, so any future consumer of
    the triple-render inherits the guarantee (r10 verdict stretch #7)."""
    from hypothesis import given, settings, strategies as st_

    @settings(max_examples=200, deadline=None)
    @given(data=st_.data())
    def run(data):
        c = data.draw(st_.integers(2, 9))
        dst = data.draw(st_.sampled_from([c - 1, c, c + 1]))
        max_in = data.draw(st_.integers(3, 12))
        npts = data.draw(
            st_.sampled_from([max_in - 1, max_in, max_in + 1])
        )
        a = data.draw(st_.integers(0, 3 * c))
        b = a + (npts - 1) * dst + 1  # exactly npts lattice points
        s = Slice((a,), (b,), (dst,))
        grid = Slice((0,), (c * ((b // c) + 2),), (c,))

        exact = sorted({(a + k * dst) // c for k in range(npts)})
        [(lo, hi, vals)] = ck.chunk_coordinate_sets(s, grid, max_in=max_in)
        assert lo == exact[0] and hi == exact[-1]

        if dst <= c or hi == lo:
            # dense branch: consecutive points at most one chunk apart
            assert vals is None
            assert exact == list(range(lo, hi + 1))
        elif npts > max_in:
            # budget exceeded with st > c: the exact modular set
            assert isinstance(vals, ck.ModSet)
            assert list(vals) == exact and len(vals) == npts
            probe = set(exact)
            assert all(
                (h in vals) == (h in probe) for h in range(lo, hi + 1)
            )
        else:
            # within budget: explicit IN tuple, unless the points
            # happen to fill the whole range (then dense again)
            if vals is None:
                assert exact == list(range(lo, hi + 1))
            else:
                assert isinstance(vals, tuple)
                assert list(vals) == exact

    run()


def test_modset_replaces_the_between_cliff():
    """The ADVICE r9 scenario: a long sparse read (step just above the
    chunk length, thousands of points) used to fall back to the full
    bounding-box BETWEEN once npts > max_in.  It now emits a ModSet
    whose membership is exactly the touched lattice chunks — ~1/st of
    the box instead of all of it."""
    s = Slice((3,), (3 + 5 * 20_000,), (5,))  # 20k points, step 5
    grid = Slice((0,), (120_000,), (4,))  # chunk length 4
    [(lo, hi, vals)] = ck.chunk_coordinate_sets(s, grid)
    assert isinstance(vals, ck.ModSet)
    assert len(vals) == 20_000
    exact = sorted({(3 + 5 * k) // 4 for k in range(20_000)})
    assert lo == exact[0] and hi == exact[-1]
    assert list(vals) == exact
    box = hi - lo + 1
    # the box holds ~25k coordinates; the set prunes ~1/5 of nothing —
    # it keeps exactly the 20k touched, dropping the ~5k skipped
    assert len(vals) < box
    probe = set(exact)
    assert all((h in vals) == (h in probe) for h in range(lo, hi + 1))
