"""Operation metrics — the reference's ``instrument!`` / Codahale
timers (mandoline.clj:312-321; utils.clj:15-32), Spark shape.

The reference wraps its hot driver-side functions with named timers
(``[namespace function "time"]``) via ``alter-var-root`` and exposes
them through ``all-metrics``.  The same design here: ``instrument()``
rebinds the module/class attributes for the engine's read/write/catalog
entry points with timing wrappers, ``all_metrics()`` snapshots the
registry, ``uninstrument()`` restores the originals.

Scope note (SURVEY §2A.8): these timers measure END-TO-END driver-call
wall time, which for this engine *includes* the distributed Spark work
the call launches — strictly more information than the reference's
single-JVM timers.  Per-task / per-operator detail (rows, bytes, spill,
shuffle) intentionally stays with Spark's own instrumentation
(SQLMetrics in the UI, ``SparkListener``); duplicating it here would
re-implement what the platform already exposes.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

__all__ = [
    "instrument",
    "uninstrument",
    "all_metrics",
    "reset_metrics",
]


@dataclass
class _Timer:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def update(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    def snapshot(self) -> dict:
        return {
            "count": self.count,
            "total_s": round(self.total_s, 6),
            "mean_s": round(self.total_s / self.count, 6) if self.count else 0.0,
            "min_s": round(self.min_s, 6) if self.count else 0.0,
            "max_s": round(self.max_s, 6),
        }


_LOCK = threading.Lock()
_REGISTRY: dict[str, _Timer] = {}
# (holder object, attribute name) -> original function; non-empty iff
# instrumented
_ORIGINALS: dict[tuple[int, str], tuple[object, str, object]] = {}


def _timed(name: str, fn):
    timer = _REGISTRY.setdefault(name, _Timer())
    # reentrancy guard: a wrapped function that recurses through its
    # module-global name (e.g. strided get_slice reading its bounding
    # box via the plain path) must count as ONE user-level call, not
    # two nested timings of the same wall-clock span
    depth = threading.local()

    def wrapper(*args, **kwargs):
        if getattr(depth, "n", 0):
            return fn(*args, **kwargs)
        depth.n = 1
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            depth.n = 0
            with _LOCK:
                timer.update(time.perf_counter() - t0)

    wrapper.__name__ = getattr(fn, "__name__", name)
    wrapper.__doc__ = getattr(fn, "__doc__", None)
    wrapper.__wrapped__ = fn
    return wrapper


def _targets():
    """The instrumented surface — the engine's analogue of the
    reference's instrument! list (mandoline.clj:313-321): version
    lookup, chunk/slab reads, streaming reads, catalog listing,
    metadata, plus the write entry points (the reference's FIX comment
    in utils.clj:34 asks for write-side coverage; the Spark engine has
    it)."""
    from . import maintenance, reader, writer
    from .store import Connection, Store

    return [
        (reader, "stream"),
        (reader, "get_slice"),
        (reader, "cells_df"),
        (Connection, "last_version"),
        (Connection, "versions"),
        (Connection, "metadata"),
        (Store, "list_datasets"),
        (writer, "write_variable"),
        (writer, "write_pieces"),
        (writer, "ingest_aligned"),
        (maintenance, "vacuum"),
        (maintenance, "compact_index"),
    ]


def _name_of(holder, attr: str) -> str:
    mod = getattr(holder, "__module__", None) or getattr(
        holder, "__name__", "?"
    )
    qual = getattr(holder, "__qualname__", None)
    base = f"{mod}.{qual}" if qual else mod
    return f"{base}.{attr}.time"


def instrument() -> list[str]:
    """Wrap the hot entry points with timers; idempotent.  Returns the
    timer names registered."""
    names = []
    with _LOCK:
        for holder, attr in _targets():
            key = (id(holder), attr)
            name = _name_of(holder, attr)
            names.append(name)
            if key in _ORIGINALS:
                continue
            fn = holder.__dict__[attr]
            _ORIGINALS[key] = (holder, attr, fn)
            setattr(holder, attr, _timed(name, fn))
    return names


def uninstrument() -> None:
    """Restore the original functions (timers keep their counts until
    :func:`reset_metrics`)."""
    with _LOCK:
        for holder, attr, fn in _ORIGINALS.values():
            setattr(holder, attr, fn)
        _ORIGINALS.clear()


def all_metrics() -> dict[str, dict]:
    """Snapshot of every registered timer, keyed
    ``module.function.time`` (the reference's [nsp fn "time"] naming,
    utils.clj:17-27)."""
    with _LOCK:
        return {k: t.snapshot() for k, t in sorted(_REGISTRY.items())}


def reset_metrics() -> None:
    with _LOCK:
        _REGISTRY.clear()
