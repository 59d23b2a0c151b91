"""Hyper-rectangle selector algebra.

A ``Slice`` selects, per dimension, the half-open strided range
``[start, stop)`` with stride ``step``.  This is the engine's
"predicate/selection" layer: every read and write request is a Slice,
and chunk pruning is Slice arithmetic.

Semantics mirror the reference engine's slice algebra
(/root/reference/src/io/mandoline/slice.clj:8-142) but the
implementation is plain Python/numpy.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass
from typing import Iterator, Sequence, Tuple


@dataclass(frozen=True)
class Slice:
    """Per-dimension ``[start, stop)`` with stride ``step``.

    ``start``/``stop``/``step`` are equal-length int tuples.  A
    zero-dimensional (scalar) slice has all three empty.
    """

    start: Tuple[int, ...]
    stop: Tuple[int, ...]
    step: Tuple[int, ...]

    @property
    def ndim(self) -> int:
        return len(self.start)

    def __post_init__(self) -> None:
        if not (len(self.start) == len(self.stop) == len(self.step)):
            raise ValueError(
                f"start, stop and step do not all have the same arity "
                f"({self.start} {self.stop} {self.step})"
            )


def mk_slice(
    start: Sequence[int],
    stop: Sequence[int] | None = None,
    step: Sequence[int] | None = None,
) -> Slice:
    """Construct a Slice; stop defaults to start+1, step to all-ones.

    Mirrors mk-slice (slice.clj:8-32): step cannot be given without stop.
    """
    start_t = tuple(int(x) for x in start)
    stop_t = (
        tuple(int(x) + 1 for x in start_t)
        if stop is None
        else tuple(int(x) for x in stop)
    )
    step_t = (
        tuple(1 for _ in start_t) if step is None else tuple(int(x) for x in step)
    )
    return Slice(start_t, stop_t, step_t)


def start_lt_stop(s: Slice) -> bool:
    """True when every dimension has positive extent (slice.clj:34-35)."""
    return all(a < b for a, b in zip(s.start, s.stop))


def get_shape(s: Slice) -> Tuple[int, ...]:
    """Per-dimension element counts ``ceil((stop-start)/step)``.

    Mirrors get-shape (slice.clj:37-41); requires positive extent.
    """
    if not start_lt_stop(s):
        raise ValueError(f"slice has non-positive extent: {s}")
    return tuple(
        len(range(a, b, st)) for a, b, st in zip(s.start, s.stop, s.step)
    )


def num_elements(s: Slice) -> int:
    return math.prod(get_shape(s))


def contains(a: Slice, b: Slice, *more: Slice) -> bool:
    """True when ``a`` is inside ``b`` (and b inside the next, ...).

    Mirrors contains (slice.clj:46-59) including the 0-d case: a 0-d
    slice is contained only in another 0-d slice.
    """
    if len(b.start) == 0:
        ok = len(a.start) == 0
    else:
        ok = all(x >= y for x, y in zip(a.start, b.start)) and all(
            x <= y for x, y in zip(a.stop, b.stop)
        )
    if not ok:
        return False
    if len(more) >= 1:
        return contains(b, *more) if len(more) >= 1 else True
    return True


def step_is_one(s: Slice) -> bool:
    return all(x == 1 for x in s.step)


def get_intersection(a: Slice, b: Slice) -> Slice:
    """Fast intersection; requires step=1 on both slices.

    Mirrors get-intersection (slice.clj:104-126): raises ValueError when
    the slices do not intersect with positive area in every dimension.
    """
    if not (step_is_one(a) and a.step == b.step):
        raise ValueError("get_intersection requires step=1 slices")
    if a == b:
        return a
    start = tuple(max(x, y) for x, y in zip(a.start, b.start))
    stop = tuple(min(x, y) for x, y in zip(a.stop, b.stop))
    if not all(t - s > 0 for s, t in zip(start, stop)):
        raise ValueError(f"The slices do not intersect: {a} {b}")
    return Slice(start, stop, a.step)


def intersect_sorted_vector(x: Sequence[int], y: Sequence[int]) -> list:
    """Intersection of two sorted int sequences (slice.clj:61-74) —
    kept for parity/testing; the engine path uses the O(1) arithmetic
    in :func:`get_intersection_general` instead."""
    out: list[int] = []
    i = j = 0
    while i < len(x) and j < len(y):
        if x[i] < y[j]:
            i += 1
        elif x[i] > y[j]:
            j += 1
        else:
            out.append(x[i])
            i += 1
            j += 1
    return out


def _ap_intersection(
    a0: int, a1: int, sa: int, b0: int, b1: int, sb: int
) -> Tuple[int, int, int] | None:
    """Intersection of the arithmetic progressions
    ``range(a0, a1, sa)`` and ``range(b0, b1, sb)`` as
    ``(first, last+1, lcm)``, or None when empty.

    Two APs intersect in an AP whose step is ``lcm(sa, sb)``; the
    anchor solves ``x ≡ a0 (mod sa), x ≡ b0 (mod sb)`` (CRT), which is
    solvable iff ``gcd(sa, sb)`` divides ``b0 - a0``.  O(1) per
    dimension vs the reference's materialize-and-scan
    (get-intersection-slow, slice.clj:76-102) — same result, usable at
    any extent."""
    g = math.gcd(sa, sb)
    if (b0 - a0) % g:
        return None
    step = sa // g * sb  # lcm
    # CRT anchor: a0 + sa * t where t ≡ (b0-a0)/g * inv(sa/g) (mod sb/g)
    m = sb // g
    t = ((b0 - a0) // g * pow(sa // g, -1, m)) % m if m > 1 else 0
    x0 = a0 + sa * t  # smallest common element ≥ a0 congruent-wise
    lo = max(a0, b0)
    if x0 < lo:
        x0 += (lo - x0 + step - 1) // step * step
    hi = min(a1, b1)  # exclusive
    if x0 >= hi:
        return None
    last = x0 + (hi - 1 - x0) // step * step
    return x0, last + 1, step


def get_intersection_general(a: Slice, b: Slice) -> Slice:
    """Stride-general intersection (get-intersection-slow,
    slice.clj:76-102): per dimension, the set intersection of the two
    strided ranges, returned as ``[min, max+1)`` with
    ``step = lcm(step_a, step_b)``.  Raises ValueError when any
    dimension's intersection is empty — same contract as
    :func:`get_intersection`, which remains the step-1 fast path."""
    if a.ndim != b.ndim:
        raise ValueError("arity mismatch")
    if a == b:
        return a
    start, stop, step = [], [], []
    for a0, a1, sa, b0, b1, sb in zip(
        a.start, a.stop, a.step, b.start, b.stop, b.step
    ):
        got = _ap_intersection(a0, a1, sa, b0, b1, sb)
        if got is None:
            raise ValueError(f"The slices do not intersect: {a} {b}")
        start.append(got[0])
        stop.append(got[1])
        step.append(got[2])
    return Slice(tuple(start), tuple(stop), tuple(step))


def intersects(a: Slice, b: Slice) -> bool:
    """Non-throwing intersection test (step=1)."""
    if len(a.start) == 0:
        return len(b.start) == 0
    return all(
        min(x2, y2) - max(x1, y1) > 0
        for x1, x2, y1, y2 in zip(a.start, a.stop, b.start, b.stop)
    )


def translate(new_origin: Slice, s: Slice) -> Slice:
    """Re-origin ``s`` relative to ``new_origin`` (slice.clj:128-134)."""
    if len(new_origin.start) != len(s.start):
        raise ValueError("arity mismatch")
    start = tuple(x - o for x, o in zip(s.start, new_origin.start))
    stop = tuple(x - o for x, o in zip(s.stop, new_origin.start))
    return Slice(start, stop, s.step)


def iter_coords(s: Slice) -> Iterator[Tuple[int, ...]]:
    """Row-major coordinate iterator, last dimension fastest
    (slice.clj:136-142)."""
    return itertools.product(
        *(range(a, b, st) for a, b, st in zip(s.start, s.stop, s.step))
    )


def to_lattice_index(view: Slice, base: Slice) -> Tuple[slice, ...]:
    """Numpy index selecting ``view`` out of an array holding ``base``'s
    LATTICE points — position ``k`` of dimension ``d`` holds data
    coordinate ``base.start[d] + k * base.step[d]``.  ``view`` must lie
    on ``base``'s lattice with the same per-dimension step (the shape
    :func:`get_intersection_general` returns for a step-1 slab clipped
    to a strided request).  The executor-side stride subsampling ships
    pieces in this coordinate system so the driver pastes them into the
    strided result without materializing the step-1 bounding box."""
    out = []
    for v0, v1, vst, b0, bst in zip(
        view.start, view.stop, view.step, base.start, base.step
    ):
        if vst != bst or (v0 - b0) % bst:
            raise ValueError(
                f"view {view} is not on the lattice of {base}"
            )
        k0 = (v0 - b0) // bst
        k1 = (v1 - 1 - b0) // bst + 1
        out.append(slice(k0, k1, 1))
    return tuple(out)


def to_numpy_index(view: Slice, base: Slice) -> Tuple[slice, ...]:
    """Numpy basic-slicing index selecting ``view`` out of an array whose
    coordinates are ``base`` (step-1).  Zero-copy — mirrors the
    reference's sectionNoReduce view semantics (slab.clj:70-84)."""
    if not step_is_one(base):
        raise ValueError("base slice must have step=1")
    return tuple(
        slice(v0 - b0, v1 - b0, st)
        for v0, v1, st, b0 in zip(view.start, view.stop, view.step, base.start)
    )
