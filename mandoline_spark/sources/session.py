"""SparkSession factory with the engine's standard configuration.

Tuned for the test environment (local[N]) but every setting is the one
you'd want on a real cluster: AQE on (runtime re-plan + skew-join),
Arrow for pandas UDFs, shuffle partition count sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mandoline_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Filter inference re-materializes aliased expressions inside the
        # inferred predicate: isnotnull(<alias>) pushed below a Project
        # inlines the alias's whole expression tree per input row.  For
        # this engine's wide array/lambda expressions (minhash/simhash
        # signatures, gram arrays) that turns an O(tokens) projection
        # into an O(tokens x k) filter evaluated twice per join side
        # (measured 4-7x slowdowns).  The rules only help skip NULL join
        # keys early; every key column in this engine is non-null.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints,"
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Broadcast/shuffle state is context-cleaned only when the
        # driver GCs the referencing objects; a mostly-idle large heap
        # can let hundreds of stale broadcasts pile up across a long
        # query sequence (observed as multi-second drag on later
        # queries).  Periodic GC bounds that accumulation.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode heap serves driver AND all 32 executor threads;
        # 12g (box has 128 GiB) keeps the 412 MiB array-scan driver
        # assembly out of full-GC territory (observed 2-10s swings on
        # the identical scan plan at 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
