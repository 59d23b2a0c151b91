"""Streaming-path throughput harness: what does the structured-
streaming ingestion gate actually sustain, and how does it scale with
corpus volume and batch count?

Three measurements, all through the availableNow trigger (process
everything queued, then stop — wall time is therefore end-to-end
micro-batch scheduling + state-store work, not a steady-state
idealization):

- **exact-dedup gate** (``dedup_stream``, md5 keys, global state) over
  the 1x and 10x document corpora from tools/scale_check.py, 4 files
  per micro-batch — the ingestion-side gate a training pipeline runs
  so duplicates never reach storage.  The 10x corpus runs 10x the
  micro-batches AND 10x the state inserts.
- **watermarked tumbling aggregation** (``tumbling_counts``) over the
  100 k-row sf0.1 events table split into 8 files — the windowed-agg
  shape with late-data semantics.

Round-8 findings (local[32], best-of-2 fresh checkpoints): dedup gate
5 k docs / 1 batch in 1.8 s (2.8 k rows/s), 50 k docs / 10 batches in
10.9 s (4.6 k rows/s) — throughput RISES with batch count as the
first-batch constants amortize, and the steady per-batch wall is
~1.1 s (micro-batch planning + state-store commit, at 5 k rows/batch
clearly constant-dominated); tumbling agg 100 k events / 2 batches in
3.5 s (28 k rows/s).  These are LOCAL micro-batch scheduling numbers
(one driver, default HDFS-backed state store); the per-batch constant
is the quantity a deployment divides across executors, and the
state-store insert cost is what grows with distinct-content volume.

Usage: PYTHONPATH=<repo> python tools/scale_check_stream.py
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mandoline_spark.sources.session import get_spark  # noqa: E402
from mandoline_spark.streaming.ops import (  # noqa: E402
    dedup_stream,
    read_events_stream,
    run_available_now,
    tumbling_counts,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_BASE = "/tmp/scale"


def ensure_corpora() -> None:
    if not os.path.isdir(f"{SCALE_BASE}/x10/documents.parquet"):
        from scale_check import build_corpora  # same directory

        build_corpora()


def best2(fn):
    b = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        b = dt if b is None else min(b, dt)
    return b


def main() -> None:
    ensure_corpora()
    spark = get_spark()
    docs_schema = spark.read.parquet(
        f"{SCALE_BASE}/x1/documents.parquet"
    ).schema
    work = tempfile.mkdtemp(prefix="mandoline_stream_bench")
    seq = [0]

    def run_dedup(mult: int) -> None:
        seq[0] += 1
        ckpt = f"{work}/ck{seq[0]}"
        name = f"dedup_bench_{seq[0]}"
        src = (
            spark.readStream.schema(docs_schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(f"{SCALE_BASE}/x{mult}/documents.parquet")
        )
        gated = dedup_stream(src, content_col="text", id_col="doc_id")
        run_available_now(gated, name, "append", ckpt)
        n = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
        assert n > 0, n

    for mult, rows in ((1, 5_000), (10, 50_000)):
        w = best2(lambda: run_dedup(mult))
        print(
            f"dedup gate x{mult}: {rows} rows, "
            f"{-(-mult * 4 // 4)} batches of 4 files -> {w:.3f}s "
            f"({rows / w:,.0f} rows/s)",
            flush=True,
        )

    # events: split the single sf0.1 file into 8 files for batching
    edir = f"{work}/events8"
    spark.read.parquet(f"{SF}/events.parquet").repartition(8).write.mode(
        "overwrite"
    ).parquet(edir)

    def run_tumbling() -> None:
        seq[0] += 1
        ckpt = f"{work}/ck{seq[0]}"
        name = f"tumbling_bench_{seq[0]}"
        # read_events_stream carries the package's EVENTS_SCHEMA (plain
        # TIMESTAMP — a schema inferred from the rewritten files comes
        # back TIMESTAMP_NTZ, which watermarks reject)
        src = read_events_stream(spark, edir, max_files_per_trigger=4)
        run_available_now(tumbling_counts(src), name, "append", ckpt)
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)

    w = best2(run_tumbling)
    print(
        f"tumbling agg: 100,000 events, 2 batches -> {w:.3f}s "
        f"({100_000 / w:,.0f} rows/s)",
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
