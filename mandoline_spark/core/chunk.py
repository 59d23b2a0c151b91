"""Chunk coordinate math + content addressing (the "partitioner").

Mirrors /root/reference/src/io/mandoline/chunk.clj:11-45.  A chunk
coordinate is the per-dimension tile index ``floor(i / chunk_len)``;
``to_chunk_coordinates`` is exactly the engine's partition pruning: a
read touches only the chunks its slice overlaps.
"""

from __future__ import annotations

import hashlib
import itertools
from typing import Iterator, Tuple

from . import slab as sb
from . import slice as sl
from .slice import Slice


def to_chunk_coordinates(s: Slice, chunk_grid: Slice) -> Iterator[Tuple[int, ...]]:
    """All chunk coordinates overlapped by ``s`` given the chunk grid
    (grid step = chunk length per dim) — chunk.clj:11-25.

    Per dimension: distinct floor(i/chunk) over the strided range, then
    the cartesian product (row-major, last dim fastest).
    """
    per_dim = []
    for a, b, st, c in zip(s.start, s.stop, s.step, chunk_grid.step):
        seen = dict.fromkeys(i // c for i in range(a, b, st))
        per_dim.append(list(seen))
    return itertools.product(*per_dim)


def chunk_coordinate_ranges(s: Slice, chunk_grid: Slice) -> list[tuple[int, int]]:
    """Per-dimension inclusive (first, last) chunk-coordinate bounds for a
    step-1 slice — the compact pruning predicate pushed into Spark."""
    if not sl.step_is_one(s):
        raise ValueError("chunk_coordinate_ranges requires step=1")
    return [
        (a // c, (b - 1) // c)
        for a, b, c in zip(s.start, s.stop, chunk_grid.step)
    ]


class ModSet:
    """Compact touched-coordinate set for a stride that skips whole
    chunks, used when the explicit IN-list would exceed the literal
    budget: coordinate ``h`` in ``[lo, hi]`` is touched iff
    ``(a - h*c) mod st < c``.

    EXACT for ``st > c`` (the only branch that emits it): positions in
    chunk ``h`` are ``[h*c, h*c + c)``; the smallest lattice point
    ``x ≡ a (mod st)`` with ``x >= h*c`` lands inside iff its offset
    ``(a - h*c) mod st`` is ``< c``, and within ``[lo, hi]`` such an
    ``x`` can be neither below ``a`` (``h > lo ⇒ h*c > a``; ``h = lo``
    gives ``x = a``) nor above the last lattice point (``x > last ⇒
    x >= last + st > hi*c + c - 1``, outside every bounded chunk).
    Iterates the touched coordinates ascending (consecutive lattice
    points are ``st > c`` apart, so coordinates are strictly
    increasing and one per point)."""

    __slots__ = ("a", "st", "c", "lo", "hi", "count")

    def __init__(self, a: int, st: int, c: int, lo: int, hi: int,
                 count: int):
        self.a, self.st, self.c = a, st, c
        self.lo, self.hi, self.count = lo, hi, count

    def __len__(self) -> int:
        return self.count

    def __iter__(self):
        a, st, c = self.a, self.st, self.c
        return ((a + k * st) // c for k in range(self.count))

    def __contains__(self, h) -> bool:
        return (
            self.lo <= h <= self.hi
            and (self.a - h * self.c) % self.st < self.c
        )

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"ModSet(a={self.a}, st={self.st}, c={self.c}, "
            f"lo={self.lo}, hi={self.hi}, n={self.count})"
        )


def chunk_coordinate_sets(
    s: Slice, chunk_grid: Slice, max_in: int = 256
) -> list[tuple[int, int, Tuple[int, ...] | ModSet | None]]:
    """Per-dimension touched chunk coordinates for a GENERAL (possibly
    strided) slice, as ``(lo, hi, vals)`` with ``vals=None`` meaning
    every coordinate in ``[lo, hi]`` is touched (the dense case — the
    compact BETWEEN predicate).  ``vals`` is the explicit sorted
    coordinate set only when the stride actually skips whole chunks
    (step > chunk length), which is when pruning on it pays — the
    capability the reference designed at slice.clj:81-102 but never
    shipped (stride tests are future-fact, test/slice_test.clj:91-92).

    ``hi`` is derived from the LAST lattice point, not ``stop - 1`` —
    the [lo, hi] bound is exact in every branch, so consumers sizing
    on it (touched-chunk counts, broadcast budgets) never overcount
    (r9 review finding).

    ``max_in`` bounds the emitted IN-list, which is what actually
    costs: with step > chunk each lattice point owns its own chunk, so
    len(vals) == point count, and a multi-thousand-literal In
    expression is slower to build (one py4j literal each) and evaluate
    than the BETWEEN superset it replaces (r9 review finding — the old
    cap bounded the ENUMERATION at 65536 and could emit IN-lists that
    size)."""
    out: list[tuple[int, int, Tuple[int, ...] | None]] = []
    for a, b, st, c in zip(s.start, s.stop, s.step, chunk_grid.step):
        npts = (b - a + st - 1) // st
        last = a + (npts - 1) * st
        lo, hi = a // c, last // c
        if st <= c or hi == lo:
            # consecutive lattice points land at most one chunk apart:
            # every chunk coordinate in [lo, hi] holds a point
            out.append((lo, hi, None))
            continue
        if npts > max_in:
            # step > chunk ⇒ every point is in its own chunk, so the
            # IN-set would have npts entries.  Instead of collapsing to
            # the full-box BETWEEN (the r9 cliff: a 20k-point step-5
            # read over chunk-4 decoded every chunk in the box), emit
            # the O(1)-literal modular predicate — exact for st > c,
            # see ModSet — which the reader renders as
            # ``pmod(a - coord*c, st) < c`` beside the BETWEEN
            out.append((lo, hi, ModSet(a, st, c, lo, hi, npts)))
            continue
        vals = sorted({(a + k * st) // c for k in range(npts)})
        out.append(
            (lo, hi, None)
            if len(vals) == hi - lo + 1
            else (lo, hi, tuple(vals))
        )
    return out


def from_chunk_coordinate(chunk_grid: Slice, coord: Tuple[int, ...]) -> Slice:
    """Chunk coordinate → its data-space slice ``[k*c, (k+1)*c)``; NOT
    cropped to the dataset extent (chunk.clj:27-33, variable.clj:58-74)."""
    start = tuple(c * k for c, k in zip(chunk_grid.step, coord))
    stop = tuple(c * (k + 1) for c, k in zip(chunk_grid.step, coord))
    return Slice(start, stop, tuple(1 for _ in start))


def generate_id(slab: sb.Slab) -> str:
    """Content id = SHA-1 hex of the slab's canonical bytes
    (chunk.clj:35-45).  Identical cell contents → identical id →
    automatic chunk dedup."""
    return hashlib.sha1(sb.to_bytes(slab)).hexdigest()
