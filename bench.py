#!/usr/bin/env python
"""Benchmark harness: runs the declared query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end through the noop sink (full computation,
no driver collect skew).  A one-query warmup absorbs JVM/codegen
startup so the numbers measure the plans, not session boot.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    from mandoline_spark.queries import QUERIES
    from mandoline_spark.sources.session import get_spark

    spark = get_spark("mandoline_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Size the shuffle to the benchmark scale (sf0.1 ≈ 30 MB of parquet):
    # 8 post-shuffle partitions keep every core busy without paying
    # 32-task scheduling overhead per tiny stage.  On a real cluster the
    # session default (cores-proportional + AQE coalescing) applies.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512m")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM, codegen, parquet footers, Python UDF workers, and the
    # q34/q35 array fixture (fixture build is setup, not the read path)
    run(QUERIES["q10_agg_hash"](spark, sf_dir))
    run(QUERIES["q33_udf_surface"](spark, sf_dir))
    run(QUERIES["q32_multimodal"](spark, sf_dir))
    run(QUERIES["q34_array_slice"](spark, sf_dir))

    times: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        run(QUERIES[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_surface_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "n_queries": len(times),
            }
        )
    )


if __name__ == "__main__":
    main()
