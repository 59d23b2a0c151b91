"""Slab: an n-dimensional numpy array paired with its coordinates.

The array kernel of the engine — the "projection/merge" layer.  Chunks
are persistent instances of slabs.  Mirrors the reference's slab algebra
(/root/reference/src/io/mandoline/slab.clj:10-121) on numpy instead of
ucar.ma2: ``subset`` returns zero-copy views (numpy basic slicing) and
``merge`` is last-writer-wins assignment, exactly the semantics Spark
write/read jobs need when combining overlapping writes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from . import slice as sl
from .slice import Slice

# The reference's seven primitive element types (dataset.clj:9-12).
# `char` is stored as a UTF-16 code unit (numpy uint16) because neither
# Spark nor Arrow has a char scalar type.
DTYPES = {
    "byte": np.dtype(np.int8),
    "char": np.dtype(np.uint16),
    "short": np.dtype(np.int16),
    "int": np.dtype(np.int32),
    "long": np.dtype(np.int64),
    "float": np.dtype(np.float32),
    "double": np.dtype(np.float64),
}

TYPE_NAMES = {v: k for k, v in DTYPES.items()}


def as_dtype(type_name: str) -> np.dtype:
    """Element-type name → numpy dtype (slab.clj:35-39 analogue)."""
    try:
        return DTYPES[type_name]
    except KeyError:
        raise ValueError(f"unsupported element type: {type_name!r}") from None


@dataclass
class Slab:
    data: np.ndarray
    slice: Slice

    def __post_init__(self) -> None:
        expected = sl.get_shape(self.slice) if self.slice.ndim else ()
        if tuple(self.data.shape) != tuple(expected):
            raise ValueError(
                f"data shape {self.data.shape} != slice shape {expected}"
            )


def empty(type_name: str, s: Slice, fill: Any | None = None) -> Slab:
    """New slab of ``type_name`` over ``s`` initialized to ``fill``
    (or the type's zero value when fill is None) — slab.clj:47-68."""
    dtype = as_dtype(type_name)
    shape = sl.get_shape(s) if s.ndim else ()
    if fill is None:
        data = np.zeros(shape, dtype=dtype)
    else:
        data = np.full(shape, fill, dtype=dtype)
    return Slab(data, s)


def subset(slab: Slab, view: Slice) -> Slab:
    """Zero-copy view of ``view`` out of ``slab`` (slab.clj:70-84).

    ``view`` must be contained in the slab's slice; the slab's own step
    must be all ones (the storage path never strides chunk data).
    """
    if not sl.contains(view, slab.slice):
        raise ValueError(f"view {view} not contained in slab {slab.slice}")
    if not sl.step_is_one(slab.slice):
        raise ValueError("subset requires a step-1 slab")
    idx = sl.to_numpy_index(view, slab.slice)
    return Slab(slab.data[idx], view)


def intersect(slab: Slab, view: Slice) -> Slab:
    """Clip ``slab`` to ``view`` (need not contain) — slab.clj:86-94."""
    intersection = sl.get_intersection(slab.slice, view)
    if intersection == slab.slice:
        return slab
    return subset(slab, intersection)


def copy_into(src: Slab, dst: Slab) -> Slab:
    """Copy all of ``src`` over the corresponding cells of ``dst``
    (mutates dst; src must fit inside dst) — slab.clj:96-113."""
    if src.data.dtype != dst.data.dtype:
        raise ValueError(
            f"dtype mismatch: {src.data.dtype} vs {dst.data.dtype}"
        )
    if not sl.contains(src.slice, dst.slice):
        raise ValueError(f"src {src.slice} does not fit in dst {dst.slice}")
    if src.slice.ndim == 0:
        dst.data[()] = src.data[()]
        return dst
    idx = sl.to_numpy_index(src.slice, dst.slice)
    dst.data[idx] = src.data
    return dst


def merge(dst: Slab, src: Slab) -> Slab:
    """Overlay ``src`` onto ``dst`` where they intersect (last-writer-
    wins; mutates dst) — slab.clj:115-121."""
    if dst.slice.ndim == 0:
        return copy_into(src, dst)
    clipped = intersect(src, dst.slice)
    return copy_into(clipped, dst)


def to_bytes(slab: Slab) -> bytes:
    """Canonical byte serialization of a slab's cells (C order,
    little-endian).  Content addressing hashes these bytes."""
    return np.ascontiguousarray(slab.data).astype(
        slab.data.dtype.newbyteorder("<"), copy=False
    ).tobytes()


def from_bytes(blob: bytes, type_name: str, s: Slice, copy: bool = True) -> Slab:
    """Inverse of :func:`to_bytes` (impl.clj:187-219 analogue).

    ``copy=False`` returns a read-only view over ``blob`` (zero-copy on
    little-endian hosts) — for read paths that only merge the slab into
    a destination and never mutate it; callers that mutate slab data
    must keep the default."""
    dtype = as_dtype(type_name).newbyteorder("<")
    shape = sl.get_shape(s) if s.ndim else ()
    data = np.frombuffer(blob, dtype=dtype).reshape(shape).astype(
        as_dtype(type_name), copy=copy
    )
    return Slab(data, s)
