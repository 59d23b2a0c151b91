#!/usr/bin/env python
"""Memory-pressure resilience probe (r9 verdict #7).

Every scale probe so far ran with a roomy heap (the session default
sizes the local-mode JVM to a quarter of host memory).  This probe
runs the two heaviest pipelines — minhash-LSH pair emission and
near-dup connected components — on the x10 corpus under a deliberately
small heap, to observe whether Spark spills (acceptable: slower, still
correct) or the JVM dies (a real 100 TB finding: an executor sized
like this would need the operator re-shaped).

Run in a FRESH process (the heap is a static JVM conf):

    SPARK_GRAFT_DRIVER_MEM=2g PYTHONPATH=/root/repo \
        python tools/scale_check_memory.py

Prints one JSON line: per-op wall seconds + row counts under the
constrained heap, plus the heap actually applied.  Compare against
the roomy-heap numbers in BASELINE.md "Scale check".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mandoline_spark.functions.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from mandoline_spark.operators.graph import connected_components  # noqa: E402
from mandoline_spark.sources.session import get_spark  # noqa: E402

# reuse the scale harness's copy-unique corpus builder
from scale_check import BASE, build_corpora  # noqa: E402


def main() -> None:
    build_corpora()
    spark = get_spark("scale_check_memory")
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.conf.get("spark.driver.memory")
    docs = spark.read.parquet(f"{BASE}/x10/documents.parquet")

    out: dict = {"probe": "memory_pressure", "driver_memory": heap}
    ops = {
        "minhash_lsh_x10": lambda: minhash_lsh_pairs(
            docs, threshold=0.8, n=3
        ).count(),
        "cc_clusters_x10": lambda: connected_components(
            ngram_jaccard_pairs(
                docs, threshold=0.8, n=3, ordered=False
            ).select("a", "b")
        ).count(),
    }
    for name, op in ops.items():
        t0 = time.perf_counter()
        try:
            n = op()
            out[name] = {
                "rows": n,
                "sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as e:  # OOM surfaces as a Py4J/conn error
            out[name] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "sec": round(time.perf_counter() - t0, 2),
            }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
