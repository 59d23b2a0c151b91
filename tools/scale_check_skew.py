"""Skew-resilience harness: measure the engine's two skew guards doing
their job on deliberately pathological inputs.

1. **Stop-shingle guard (max_df)** — every document gets the same
   boilerplate sentence prepended, so a handful of grams appear in ALL
   5,000 docs.  Without the guard each such gram's posting list emits
   C(5000,2) = 12.5 M pairs (the quadratic blowup a crawler-boilerplate
   corpus produces at 100 TB); with ``max_df=20`` the hot grams drop on
   the posting exchange BEFORE any list materializes (window count on
   the same hash distribution — no extra shuffle, no unspillable hot
   array; dedup.py:_posting_lists).

2. **salted_join** — a fact table whose join key is 50 % one hot value
   against a small dim: the plain shuffle join sends half the table
   through ONE task (the classic straggler); ``salted_join`` spreads
   the hot key over ``n_salt`` partitions.  AQE's skew-join split is
   the first line of defense in the engine session; the explicit salt
   exists for the pathological tail AQE's thresholds miss and is
   measured here with AQE OFF to isolate the mechanism.

Round-8 findings (local[32], sf0.1 docs, best-of-2): boilerplate
corpus with max_df=20 runs in 1.9 s — the same wall as the clean
corpus, 2.3 s (the guard pays one window over the exchange the groupBy
already needs) — while the UNGUARDED run materializes the 12.5 M-pair
quadratic object and takes 81.5 s, 44x; 600 k-row join with a 50 %-hot
key: plain shuffle join 1.03 s (half the table through one task),
salted_join 0.65 s (AQE off to isolate the mechanism; AQE's own skew
split recovers most of it too, which is why explicit salting is
opt-in).

Usage: PYTHONPATH=<repo> python tools/scale_check_skew.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mandoline_spark.functions.dedup import ngram_jaccard_pairs  # noqa: E402
from mandoline_spark.operators.joins import salted_join  # noqa: E402
from mandoline_spark.sources.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILER = (
    "this page is part of the example crawl archive please see terms"
)


def best2(fn):
    b = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        b = dt if b is None else min(b, dt)
    return b


def main() -> None:
    spark = get_spark()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dirty = docs.withColumn(
        "text", F.concat(F.lit(BOILER + " "), F.col("text"))
    )

    def pairs(d, max_df):
        return ngram_jaccard_pairs(
            d, threshold=0.5, n=3, max_df=max_df, ordered=False
        ).count()

    pairs(docs, 20)  # warm
    t_clean = best2(lambda: pairs(docs, 20))
    t_guard = best2(lambda: pairs(dirty, 20))
    print(f"clean corpus, max_df=20:        {t_clean:7.3f}s", flush=True)
    print(f"boilerplate corpus, max_df=20:  {t_guard:7.3f}s", flush=True)
    t0 = time.perf_counter()
    n_unguarded = ngram_jaccard_pairs(
        dirty, threshold=0.0, n=3, max_df=None, ordered=False
    ).count()
    t_unguarded = time.perf_counter() - t0
    print(
        f"boilerplate corpus, UNGUARDED:  {t_unguarded:7.3f}s "
        f"({n_unguarded} pairs — the quadratic object)",
        flush=True,
    )

    # -- salted join -------------------------------------------------
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # plan BUILDERS, not instances: re-collecting one DataFrame
        # object reuses its shuffle map outputs (skipped stages) and
        # times only the final stage — each timed pass must build a
        # fresh lineage, same as bench.py's per-pass rebuild
        def fact():
            li = spark.read.parquet(f"{SF}/lineitem.parquet")
            # 50% of rows share one hot key; the rest spread over 1000
            return li.select(
                F.when(F.rand(7) < 0.5, F.lit(0))
                .otherwise((F.rand(11) * 1000).cast("long"))
                .alias("k"),
                F.col("l_extendedprice").alias("v"),
            )

        def dim():
            return spark.range(0, 1001).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("w")
            )

        # deny the broadcast fast path: the straggler only exists on a
        # genuine shuffle join, which is what a dim above the broadcast
        # threshold forces at scale
        def plain():
            return fact().join(
                dim().hint("shuffle_merge"), "k"
            ).agg(F.sum(F.col("v") + F.col("w")).alias("s"))

        def salted():
            return salted_join(fact(), dim(), on="k", n_salt=32).agg(
                F.sum(F.col("v") + F.col("w")).alias("s")
            )

        a = plain().collect()[0]["s"]
        b = salted().collect()[0]["s"]
        assert abs(a - b) < 1e-6 * max(abs(a), 1), (a, b)
        t_plain = best2(lambda: plain().collect())
        t_salt = best2(lambda: salted().collect())
        print(f"skewed join, plain shuffle:     {t_plain:7.3f}s", flush=True)
        print(f"skewed join, salted_join:       {t_salt:7.3f}s", flush=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


if __name__ == "__main__":
    main()
