#!/usr/bin/env python
"""Commit-time reconcile cost probe (r11: the cross-writer written-box
mask protocol, writer.reconcile_version).

The protocol's 100 TB posture claim is that reconcile cost is
O(contested chunks) — one Spark job folding only the chunks two
concurrent shard writers both touched, independent of dataset size.
This probe builds REAL contested state (writer B's base snapshot and
generation claim run while writer A's committed generation is hidden
behind list-after-write lag, exactly the fault-injected object-store
shape tests/test_cross_writer_merge.py pins) at growing contested-chunk
counts and times ``finish_version`` (which runs the reconcile), then
verifies the merged cells against a numpy mosaic oracle.

    PYTHONPATH=/root/repo python tools/scale_check_reconcile.py

Prints one JSON line: per-scale contested-chunk count, reconcile-commit
wall seconds, and oracle verdicts.  Record in BASELINE.md "Scale
check".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402

from mandoline_spark import reader, writer  # noqa: E402
from mandoline_spark.core import slab as sb  # noqa: E402
from mandoline_spark.core import slice as sl  # noqa: E402
from mandoline_spark.sources.session import get_spark  # noqa: E402
from mandoline_spark.store import Store  # noqa: E402
from faults import ObjectStoreFS  # noqa: E402

C = 8  # chunk edge


def _drain(conn, n=10_100):
    d = os.path.join(conn.path, "versions")
    for _ in range(n):
        conn.fs.listdir(d)


def run_scale(spark, grid: int) -> dict:
    """grid x grid chunk grid; writer A fills the top rows, writer B
    the left columns (both half+3 deep, NOT chunk-aligned) — every
    chunk in the top-left (grid/2+1)^2 quadrant is contested.  The
    first run of a session carries Spark codegen warmup (~2x)."""
    root = tempfile.mkdtemp(prefix="mand_reconcile")
    try:
        n = grid * C
        store = Store(spark, root, fs=ObjectStoreFS(lag=10_000))
        conn = store.create_dataset("ds")
        tok = conn.add_version(
            {
                "dimensions": {"x": n, "y": n},
                "chunk-dimensions": {"x": C, "y": C},
                "variables": {
                    "v": {
                        "type": "short",
                        "shape": ["x", "y"],
                        "fill-value": -1,
                    }
                },
            }
        )
        # NON-chunk-aligned stripes (half + 3): aligned slabs would
        # take the zero-shuffle ingest path, whose full-cover blobs are
        # wholesale-complete and legitimately never record masks
        half = n // 2 + 3
        # writer A: top rows = 7 (claims g0 == expected → wholesale)
        writer.write_variable(
            conn, tok, "v",
            [sb.empty("short", sl.mk_slice((0, 0), (half, n)), 7)],
            index_mode="delta",
        )
        # writer B: left columns = 9; A's generation is lag-hidden,
        # so B's snapshot expects g0, claims g1 → written-box masks
        writer.write_variable(
            conn, tok, "v",
            [sb.empty("short", sl.mk_slice((0, 0), (n, half)), 9)],
            index_mode="delta",
        )
        _drain(conn)
        vid = tok["version-id"]
        masked = writer._gen_masked(conn, vid, "v", 1)
        contested = (grid // 2 + 1) ** 2  # rows x cols both cover half+3
        t0 = time.perf_counter()
        conn.finish_version(tok)
        commit_sec = time.perf_counter() - t0
        _drain(conn)

        got = reader.get_slice(
            conn, reader.on_last_version(conn), "v",
            sl.mk_slice((0, 0), (n, n)),
        ).data
        oracle = np.full((n, n), -1, dtype=np.int16)
        oracle[:half, :] = 7
        oracle[:, :half] = 9  # B is the later layer: last-writer-wins
        ok = bool(np.array_equal(got, oracle))
        return {
            "grid": grid,
            "chunks": grid * grid,
            "contested": contested,
            "masked_gen": bool(masked),
            "reconcile_commit_sec": round(commit_sec, 3),
            "oracle_ok": ok,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    spark = get_spark()
    out = [run_scale(spark, g) for g in (8, 16, 32)]
    print(json.dumps({"reconcile_scale": out}))


if __name__ == "__main__":
    main()
