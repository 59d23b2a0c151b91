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
