"""Declared query surface (SURVEY.md §2B): Spark implementation + DuckDB oracle.

Each entry is a (spark_fn, oracle_sql) pair over the driver fixtures
(`/root/testdata/<sf>/*.parquet`).  The Spark side is idiomatic
DataFrame code (Catalyst plans everything); the oracle is ANSI SQL that
DuckDB runs on the same parquet.  Every computed column is aliased
identically on both sides and every query is fully ordered/rounded so
value hashes are stable across engines.
"""

from __future__ import annotations

import os
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# Resolved-relation cache: spark.read.parquet costs ~170 ms per call
# (file listing + footer schema inference), and every declared query
# re-resolves 1-4 tables.  A real deployment resolves tables ONCE via
# the catalog (CREATE TABLE / metastore) — this cache is that catalog
# for the fixture dirs.  Keyed by session id so a fresh session
# re-resolves; the fixture files are immutable for a session's life.
# value keeps a strong ref to the session so a stopped session's id()
# can never be reused for a different live session
_LOAD_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}
# Bounded FIFO: the strong session refs would otherwise pin every
# stopped session (and its JVM-side state) for the process's life in a
# harness that creates many sessions/dirs.
_LOAD_CACHE_MAX = 256


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit[1]
    if name == "events":
        df = load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    while len(_LOAD_CACHE) >= _LOAD_CACHE_MAX:
        _LOAD_CACHE.pop(next(iter(_LOAD_CACHE)))
    _LOAD_CACHE[key] = (spark, df)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet may store TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; in that case read the raw int64 nanos
    and truncate to Spark's native microsecond timestamps with integer
    division (a ns epoch ~1.7e18 exceeds double's 2^53 exact range, so
    no float math — DuckDB applies the identical truncation when it
    reads NANOS).  Micro/milli-precision fixtures land as a native
    timestamp column and pass through untouched."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df



def load_documents_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, repartitioned to the core count: the per-doc text
    operators (regexp token scans, stopword folds, fingerprints) are
    CPU-bound, and a one-file corpus would otherwise run them on one
    task (measured 4x on local[32] at sf0.1).  One exchange of the raw
    text, paid once per query."""
    df = load(spark, sf_dir, "documents")
    return df.repartition(spark.sparkContext.defaultParallelism)


def psort(df: DataFrame, *cols) -> DataFrame:
    """Presentation sort for BOUNDED results (fixed group keys, top-k,
    single-row checks, thresholded pair/screen sets): one round-robin
    exchange onto the gather point + a single-partition sort.  Every
    upstream stage keeps its parallelism — ``repartition`` is a
    shuffle, unlike ``coalesce(1)``, which would collapse the parent
    stages to one task.  Used ONLY where the result is small by
    construction at every scale: there the range-partitioned
    ``orderBy`` pays a sampling job + range exchange to distribute a
    sort the driver's collect gathers to one stream anyway (measured
    0.15-0.25s/query at sf0.1).  Corpus-proportional outputs (per-doc
    listings) go through :func:`osort` instead, whose catalog-stats
    gate falls back to ``orderBy`` above the serial-sort cutover — a
    single-partition sort of an unbounded result would be the classic
    scale bottleneck."""
    return df.repartition(1).sortWithinPartitions(*cols)


# Exact-decimal revenue term, r14 (VERDICT r13 #1/#2).  The fixture's
# prices and discounts are cent-quantized, so extprice*(1-disc) is an
# exact 4-dp decimal — and some GROUP sums land exactly on the half-cent
# boundary (4/175 q91 groups and 185/12,969 q104 order sums at sf0.01,
# e.g. NATION_12/1999 = 19766258.9250).  round(sum(double), 2) on those
# groups is decided by float accumulation ORDER, so any plan rewrite or
# thread-count change re-rolls the coin (that's exactly how the r13
# partial-agg rewrite flipped q91's driver hash while staying inside the
# old parity suite's 1e-9 tolerance).  Accumulating in exact decimal on
# BOTH the Spark and oracle side makes round(,2) deterministic under ANY
# plan shape; the rounded decimal is cast back to double (both engines
# perform the same correctly-rounded decimal->double conversion, so the
# stringified hash matches bit-for-bit).  Cost: decimal sum is a
# Tungsten built-in; at 100 TB the accuracy is plan-independent by
# construction instead of by fixture accident.
REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(5,4)))"
)


def rev_dec():
    """Spark twin of :data:`REV_SQL` — see the comment above.  The
    double->decimal casts are unambiguous: a float64 is a dyadic
    rational, never exactly halfway between two 4-dp decimals, so both
    engines recover the identical quantized value."""
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(5,4)")
        - F.col("l_discount").cast("decimal(5,4)")
    )


def _footer_files(path: str) -> list[str]:
    """The parquet files behind a table path: the file itself, or — a
    Spark-written table is a DIRECTORY of part files — its fragments.
    Directory tables are the production layout; every footer-statistic
    helper aggregates over fragments exactly as a catalog would."""
    if not os.path.isdir(path):
        return [path]
    # recurse: partitioned/nested layouts keep their fragments under
    # key=value subdirectories — a one-level listing returned [] there,
    # and callers summing over [] cached a silent 0 (r10 ADVICE).  A
    # real catalog's file listing is recursive; match it.
    out = []
    for base, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        out.extend(
            os.path.join(base, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return sorted(out)


def _footer_key(sf_dir: str, name: str) -> tuple:
    """Cache key for footer-statistic reads: (path, mtime_ns, size),
    aggregated over fragments for directory tables.  Keying on file
    identity — not just the path — means an in-place rewrite (or a
    fragment added to a directory table) invalidates the cached stats
    the way a real catalog's file-listing refresh would (r9 ADVICE: a
    path-only key silently served stale bounds/counts)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    mt = sz = 0
    for f in _footer_files(path):
        st = os.stat(f)
        mt = max(mt, st.st_mtime_ns)
        sz += st.st_size
    return (path, mt, sz)


_FOOTER_ROWS: dict[tuple, int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Row count for a base table from the parquet FOOTER — catalog
    statistics read driver-side (no Spark job, no data pages); cached
    per (path, mtime, size), summed over a directory table's
    fragments.  The structural input to :func:`osort`."""
    key = _footer_key(sf_dir, name)
    hit = _FOOTER_ROWS.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        files = _footer_files(key[0])
        if not files:
            # A Spark-written EMPTY table is a directory holding only
            # the _SUCCESS marker (zero part files) — 0 is the correct
            # answer there.  Any other fragmentless directory is a
            # layout this helper does not understand — raise loudly
            # (table_rows is value-bearing in q84/q94; caching 0 there
            # would be a silent wrong answer, r10 ADVICE)
            if os.path.isdir(key[0]) and os.path.exists(
                os.path.join(key[0], "_SUCCESS")
            ):
                hit = _FOOTER_ROWS[key] = 0
                return hit
            raise FileNotFoundError(
                f"no parquet fragments under table path {key[0]}"
            )
        hit = _FOOTER_ROWS[key] = sum(
            pq.ParquetFile(f).metadata.num_rows for f in files
        )
    return hit


_FOOTER_MINMAX: dict[tuple, tuple | None] = {}


def table_col_minmax(sf_dir: str, name: str, col: str):
    """(min, max) of an unfiltered base-table column from the parquet
    FOOTER statistics — catalog statistics read driver-side (no Spark
    job, no data pages), cached per (path, mtime, size, column).  Exact for
    the types used here (int64 timestamps carry untruncated stats, and
    parquet min/max ignore nulls exactly as F.min/F.max do).  Returns
    None when any row group lacks the statistic — callers must keep a
    Spark aggregation fallback, the same contract a catalog-stats
    optimizer rule has."""
    key = _footer_key(sf_dir, name) + (col,)
    if key not in _FOOTER_MINMAX:
        import pyarrow.parquet as pq

        mins: list = []
        maxs: list = []
        ok = True
        for f in _footer_files(key[0]):
            md = pq.ParquetFile(f).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                if rg.num_rows == 0:
                    # empty fragments/row groups carry no stats and no
                    # rows — they cannot constrain the bounds (r10
                    # review: treating them as missing stats disabled
                    # footer bounds for any directory table holding an
                    # empty part file, which Spark writes routinely)
                    continue
                stat = None
                for ci in range(rg.num_columns):
                    c = rg.column(ci)
                    if c.path_in_schema == col:
                        stat = c.statistics
                        break
                if stat is None or not stat.has_min_max:
                    ok = False
                    break
                mins.append(stat.min)
                maxs.append(stat.max)
            if not ok:
                break
        _FOOTER_MINMAX[key] = (
            (min(mins), max(maxs)) if ok and mins else None
        )
    return _FOOTER_MINMAX[key]


# Serial-sort cutover for osort(), in rows of the driving table.
# Measured at sf0.1/local[32]: a 150k-row gather sort beats the range
# orderBy 0.25s vs 0.39s, a 600k-row gather loses 0.75s vs 0.48s — the
# bottleneck is the single-consumer exchange, not the sort itself.
_GATHER_MAX_ROWS = 250_000


def osort(df: DataFrame, src_rows: int, *cols) -> DataFrame:
    """Adaptive presentation sort for corpus-proportional computed
    outputs — the cost-based cutover between :func:`psort` (serial)
    and ``orderBy`` (distributed) that every engine applies to its
    final sort.  ``src_rows`` is a STRUCTURAL upper bound on the
    result's row count taken from catalog statistics
    (:func:`table_rows` — the table the result is row-for-row derived
    from, or whose key it is grouped by).  At or below the cutover the
    result gathers onto one partition and sorts there: ONE job, no
    range-sampling pass (orderBy pays a sampling job per action that
    re-runs the sort's child up to its last shuffle).  Above the
    cutover: the range-partitioned global ``orderBy``, whose sampling
    + distributed sort is the only shape that scales.  On a 100 TB
    deployment every base table's footer count exceeds the cutover,
    so the plan is exactly the orderBy one; the gate reads only
    driver-side metadata (zero extra Spark jobs on either branch)."""
    if src_rows <= _GATHER_MAX_ROWS:
        return psort(df, *cols)
    return df.orderBy(*cols)


def ranged(df: DataFrame, *keys) -> DataFrame:
    """Global-order layout for CORPUS-PROPORTIONAL computed outputs,
    placed on the RAW scan: range-exchange + in-partition sort on the
    presentation keys BEFORE the expensive projection.  Three effects,
    all measured (r6):

    - the range sampler reads the cheap source scan instead of
      re-executing the computed columns (a final ``orderBy`` above an
      un-shuffled expensive projection runs the projection TWICE —
      once for the sampling job, once for the exchange; observed
      0.2-0.4s per query at sf0.1, and at 100 TB it doubles the
      dominant map stage);
    - the metric columns are computed exactly once AFTER the exchange,
      so the work spreads across the range partitions even when the
      source collapses to one task (single file / single row-group);
    - the order-preserving projections on top keep partition-prefix
      order, which under range partitioning IS global row order — the
      same result contract as ``orderBy``, same operators (sample,
      range exchange, sort), only placed below the compute instead of
      above it.

    Order contract (VERDICT r7 #6): global order is delivered through
    the PARTITION-INDEX traversal — ``collect()`` / ``toPandas()`` /
    ``toLocalIterator()`` concatenate partitions in index order, and
    under range partitioning that concatenation IS the total order
    (exactly how Spark's own ``orderBy`` delivers its result).  A
    ``.write`` sink does NOT re-establish it: files commit in task-
    completion order and downstream re-reads split/merge them, the
    same caveat as writing any ``orderBy`` result.  Callers that need
    sorted FILES should write with ``partitionBy``/bucketing or read
    back with an explicit sort; every ``ranged()`` call site in this
    module is a collect-consumed query result.
    tests/test_plan_quality.py pins the physical contract (range
    exchange + in-partition sort, no top-level Sort)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
# str, or a zero-arg callable resolved at oracle_sql() time — used by
# oracles whose literal-VALUES expectation depends on which sf fixture
# the harness pairs them with (q38); __spark_entry__.oracle_sql and
# tests/test_oracle_parity.py both resolve callables.
ORACLES: dict[str, str | Callable[[], str]] = {}

# The sf dir the ORACLE side is generated for.  The driver runs its
# DuckDB comparison at sf0.01 and never sets this; the local parity
# suite exports it to whatever sf the Spark side reads.
ORACLE_SF_ENV = "MANDOLINE_TEST_SF"
_DRIVER_SF = "/root/testdata/sf0.01"


def _q(name: str, oracle: str | Callable[[], str] | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


# -- scans / filters ---------------------------------------------------------


@_q(
    "q01_scan_project",
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
)
def q01(spark, sf):
    return (
        load(spark, sf, "region")
        .select("r_regionkey", "r_name")
        .transform(psort, "r_regionkey")
    )


@_q(
    "q02_filter",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE l_quantity > 45 AND l_returnflag = 'R' "
    "ORDER BY l_orderkey, l_linenumber",
)
def q02(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@_q(
    "q03_range_count",
    "SELECT count(*) AS n FROM lineitem "
    "WHERE l_partkey >= 100 AND l_partkey < 200",
)
def q03(spark, sf):
    li = load(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_partkey") >= 100) & (F.col("l_partkey") < 200)
    ).agg(F.count("*").alias("n"))


# -- joins -------------------------------------------------------------------


@_q(
    "q04_join_inner",
    "SELECT n_name, count(*) AS c FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name ORDER BY n_name",
)
def q04(spark, sf):
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(F.count("*").alias("c"))
        .transform(psort, "n_name")
    )


@_q(
    "q05_join_broadcast",
    "SELECT r_name, count(*) AS c FROM nation "
    "JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY r_name ORDER BY r_name",
)
def q05(spark, sf):
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .groupBy("r_name")
        .agg(F.count("*").alias("c"))
        .transform(psort, "r_name")
    )


@_q(
    "q06_join_left",
    "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer "
    "LEFT JOIN orders ON o_custkey = c_custkey "
    "GROUP BY c_custkey ORDER BY c_custkey",
)
def q06(spark, sf):
    """Eager aggregation below the left join (r15, VERDICT r14 #1 —
    the q91 trick): count(o_orderkey) distributes over o_custkey, so
    orders pre-aggregates to one row per customer-with-orders BEFORE
    the join; the post-join count collapses to coalesce(_n, 0) for
    the no-order customers the left join null-extends.  The join
    input shrinks from |orders| to |distinct o_custkey| — at bench
    scale that keeps the broadcast trivially small, and at 100 TB it
    is the difference between joining 1.5e9 orders and 1e8 customers
    (the old plan broadcast/shuffled the full orders table through
    the join and re-aggregated it above).  Result identity probed
    A/B at sf0.1 (tools/probe_q06_ab.py: variants_identical) and
    pinned by the oracle parity suite."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n")
    )
    return (
        c.join(per_cust, per_cust.o_custkey == c.c_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("_n", F.lit(0)).alias("n_orders"),
        )
        .transform(osort, table_rows(sf, "customer"), "c_custkey")
    )


@_q(
    "q07_join_semi",
    "SELECT count(*) AS n FROM part WHERE p_partkey IN "
    "(SELECT l_partkey FROM lineitem WHERE l_quantity > 49)",
)
def q07(spark, sf):
    p = load(spark, sf, "part")
    li = load(spark, sf, "lineitem").filter(F.col("l_quantity") > 49)
    return p.join(
        li, p.p_partkey == li.l_partkey, "left_semi"
    ).agg(F.count("*").alias("n"))


@_q(
    "q08_join_anti",
    "SELECT count(*) AS n FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q08(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).agg(F.count("*").alias("n"))


@_q(
    "q09_join_theta",
    "SELECT count(*) AS n FROM supplier s JOIN customer c "
    "ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal",
)
def q09(spark, sf):
    s = load(spark, sf, "supplier")
    c = load(spark, sf, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        "inner",
    ).agg(F.count("*").alias("n"))


# -- aggregation -------------------------------------------------------------


@_q(
    "q10_agg_hash",
    "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq, "
    f"CAST(round(sum({REV_SQL}),2) AS DOUBLE) AS rev, count(*) AS c "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus "
    "ORDER BY l_returnflag, l_linestatus",
)
def q10(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sq"),
            # exact-decimal accumulation (see rev_dec): q10's 6 group
            # sums were audited >=0.01 cents off any boundary at sf0.01
            # (VERDICT r13), but the revenue class is decimal everywhere
            # so safety is by construction, not fixture accident
            F.round(F.sum(rev_dec()), 2).cast("double").alias("rev"),
            F.count("*").alias("c"),
        )
        .transform(psort, "l_returnflag", "l_linestatus")
    )


@_q(
    "q11_agg_distinct",
    "SELECT count(DISTINCT o_custkey) AS n FROM orders",
)
def q11(spark, sf):
    return load(spark, sf, "orders").agg(
        F.countDistinct("o_custkey").alias("n")
    )


@_q(
    "q12_rollup",
    "SELECT coalesce(l_returnflag,'ALL') AS rf, "
    "coalesce(l_linestatus,'ALL') AS ls, count(*) AS c FROM lineitem "
    "GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls",
)
def q12(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("c"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "c",
        )
        .transform(psort, "rf", "ls")
    )


@_q(
    "q13_cube",
    "SELECT coalesce(o_orderstatus,'ALL') AS st, "
    "coalesce(o_orderpriority,'ALL') AS pr, count(*) AS c FROM orders "
    "GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY st, pr",
)
def q13(spark, sf):
    o = load(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("c"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pr"),
            "c",
        )
        .transform(psort, "st", "pr")
    )


# -- window functions --------------------------------------------------------


@_q(
    "q14_window_rank",
    "SELECT o_custkey, o_orderkey FROM (SELECT o_custkey, o_orderkey, "
    "row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t "
    "WHERE rn = 1 ORDER BY o_custkey",
)
def q14(spark, sf):
    """Filtering window (rn = 1 keeps ~1/10 of rows): the hash window
    exchange + top orderBy beats a range exchange feeding the window
    here (r6 A/B) — the final sort's input is the FILTERED output, so
    pre-ranging would push every input row through the range exchange
    to save a sort of the small side."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
        .transform(osort, table_rows(sf, "orders"), "o_custkey")
    )


@_q(
    "q15_window_lag",
    "SELECT o_custkey, o_orderkey, round(o_totalprice - lag(o_totalprice) "
    "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS d "
    "FROM orders ORDER BY o_custkey, o_orderkey",
)
def q15(spark, sf):
    """Range exchange feeds the window (see q14); the presentation sort
    key (custkey, orderkey) differs from the window order (custkey,
    orderdate, orderkey), so an in-partition sort remains — but no
    second exchange and no sampling job re-executing the window.
    Below the osort() serial cutover the exchange gathers to ONE
    partition instead (single partition satisfies the window's
    clustering trivially): same operators, no range-sampling job."""
    o = load(spark, sf, "orders")
    n = spark.sparkContext.defaultParallelism
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    shaped = (
        o.repartition(1)
        if table_rows(sf, "orders") <= _GATHER_MAX_ROWS
        else o.repartitionByRange(n, "o_custkey")
    )
    return (
        shaped
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
            ).alias("d"),
        )
        .sortWithinPartitions("o_custkey", "o_orderkey")
    )


@_q(
    "q16_window_frame",
    "SELECT o_orderkey, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))"
    " OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND"
    " CURRENT ROW), 2) AS DOUBLE) AS rs FROM orders ORDER BY o_orderkey",
)
def q16(spark, sf):
    """Global running sum as a TWO-PHASE per-bucket prefix sum (r16,
    VERDICT r15 #1).  `Window.orderBy(key)` with no partitionBy is a
    single-partition window — the whole corpus gathers onto ONE task,
    the classic serial scale-killer (the only such shape left on the
    surface).  Rewrite: bucket rows by a key-monotone range id derived
    from catalog footer min/max (no Spark job), hash-exchange on the
    bucket, run the running sum PER BUCKET (window needs no second
    exchange — the bucket clustering is already established), and add
    each bucket's prefix offset from a small one-row-per-bucket table
    (cumulated over the bucket ids, broadcast back).  Both the per-row
    sum and the offsets accumulate in exact DECIMAL (the rev_dec
    pattern, r13 51845bc): the fixture's cent-quantized prices convert
    exactly, decimal addition is associative, so re-association cannot
    flip a round(,2) tie — the objection that withheld this rewrite in
    r15 dissolves, and the oracle accumulates in the same decimal.
    Bucket count tracks the shuffle-partition conf (scale-adaptive,
    ~64 buckets per partition so the hash spreads evenly, guide §2.5)
    and is capped so tiny fixtures keep >=64 rows per bucket.  The
    footer-stats fallback (a catalog without min/max) keeps the serial
    window — the exact contract table_col_minmax documents."""
    o = load(spark, sf, "orders")
    rows = table_rows(sf, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    bounds = table_col_minmax(sf, "orders", "o_orderkey")
    if bounds is None:  # pragma: no cover - stats always present here
        w = Window.orderBy("o_orderkey").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return o.select(
            "o_orderkey",
            F.round(F.sum(dec).over(w), 2).cast("double").alias("rs"),
        ).transform(osort, rows, "o_orderkey")
    lo, hi = int(bounds[0]), int(bounds[1])
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # pragma: no cover - e.g. "auto"
        nparts = 200
    nb = max(1, min(64 * nparts, rows // 64))
    span = max(1, (hi - lo) // nb + 1)
    # one scan, one full-data exchange: the offset branch aggregates
    # the WINDOWED stream (a bucket's total IS its running sum at the
    # bucket's last key, max_by below), so its subtree shares the main
    # branch's bucket exchange verbatim and ReuseExchange serves both
    # from one shuffle — aggregating `part` directly instead lets
    # column pruning drop o_orderkey below the exchange, splitting the
    # two subtrees into two scans + two full shuffles (measured on the
    # first cut of this rewrite)
    part = o.select(
        "o_orderkey",
        dec.alias("_v"),
        F.expr(f"(o_orderkey - {lo}) div {span}").alias("_b"),
    ).repartition("_b")
    wb = (
        Window.partitionBy("_b")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    main = part.select("_b", "o_orderkey", F.sum("_v").over(wb).alias("_c"))
    # offsets: one row per bucket (bounded metadata, <= 64*nparts
    # rows); the cumulation below is a window over THAT table only
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        main.groupBy("_b")
        .agg(F.max_by("_c", "o_orderkey").alias("_s"))
        .select("_b", F.sum("_s").over(woff).alias("_off"))
    )
    zero = F.lit(0).cast("decimal(38,2)")
    return (
        main.join(F.broadcast(off), "_b")
        .select(
            "o_orderkey",
            F.round(F.col("_c") + F.coalesce(F.col("_off"), zero), 2)
            .cast("double")
            .alias("rs"),
        )
        .transform(osort, rows, "o_orderkey")
    )


@_q(
    "q17_topk",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)
def q17(spark, sf):
    o = load(spark, sf, "orders")
    # orderBy + limit, NOT psort: Spark plans this as
    # TakeOrderedAndProject (per-partition top-k, tiny merge) — a
    # gather-point sort before the limit would funnel the whole table
    # through one task and lose that rewrite
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# -- set operations ----------------------------------------------------------


@_q(
    "q18_set_intersect",
    "SELECT c_nationkey AS k FROM customer INTERSECT "
    "SELECT s_nationkey FROM supplier ORDER BY k",
)
def q18(spark, sf):
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).transform(psort, "k")


# -- scalar functions --------------------------------------------------------


@_q(
    "q19_string_funcs",
    # '%old%' matches both 'old ...' and 'cold ...' part names at every
    # fixture sf (r2's '%gold%' matched zero rows — a vacuous pass that
    # never exercised upper/substr through the oracle hash)
    "SELECT p_partkey, upper(substr(p_name,1,5)) AS u FROM part "
    "WHERE p_name LIKE '%old%' ORDER BY p_partkey",
)
def q19(spark, sf):
    p = load(spark, sf, "part")
    return (
        p.filter(F.col("p_name").like("%old%"))
        .select(
            "p_partkey", F.upper(F.substring("p_name", 1, 5)).alias("u")
        )
        .transform(osort, table_rows(sf, "part"), "p_partkey")
    )


@_q(
    "q20_date_funcs",
    "SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS c "
    "FROM orders GROUP BY y, m ORDER BY y, m",
)
def q20(spark, sf):
    o = load(spark, sf, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .groupBy("y", "m")
        .agg(F.count("*").alias("c"))
        .transform(osort, table_rows(sf, "orders"), "y", "m")
    )


@_q(
    "q21_math_funcs",
    "SELECT l_orderkey, round(sqrt(l_quantity)+ln(l_extendedprice),6) AS v "
    "FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey",
)
def q21(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            F.round(
                F.sqrt("l_quantity") + F.log(F.col("l_extendedprice")), 6
            ).alias("v"),
        )
        # l_linenumber == 1 keeps exactly one row per order, so the
        # structural row bound for the sort gate is |orders|
        .transform(osort, table_rows(sf, "orders"), "l_orderkey")
    )


@_q(
    "q22_case_when",
    "SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' "
    "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS b "
    "FROM orders ORDER BY o_orderkey",
)
def q22(spark, sf):
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("b"),
    ).transform(osort, table_rows(sf, "orders"), "o_orderkey")


@_q(
    "q23_array_funcs",
    "SELECT vec_id, len(embedding) AS d FROM embeddings ORDER BY vec_id",
)
def q23(spark, sf):
    e = load(spark, sf, "embeddings")
    return e.select("vec_id", F.size("embedding").alias("d")).transform(
        osort, table_rows(sf, "embeddings"), "vec_id"
    )


@_q(
    "q24_json_extract",
    "SELECT event_id, props->>'$.k' AS k FROM events ORDER BY event_id",
)
def q24(spark, sf):
    ev = load(spark, sf, "events")
    return ranged(ev, "event_id").select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    )


# -- time windows ------------------------------------------------------------


@_q(
    "q25_window_tumbling",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h, "
    "event_type, count(*) AS c, round(sum(value),3) AS s FROM events "
    "GROUP BY h, event_type ORDER BY h, event_type",
)
def q25(spark, sf):
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "h"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 3).alias("s"))
        .transform(osort, table_rows(sf, "events"), "h", "event_type")
    )


@_q(
    "q26_window_sliding",
    # each event belongs to the two 1h windows (30min slide) covering it;
    # window starts align to the epoch, matching Spark's F.window
    "WITH w AS (SELECT to_timestamp((floor(epoch(ts)/1800) - o.o) * 1800) "
    "AS ws, event_type, value FROM events, (VALUES (0),(1)) o(o)), "
    "f AS (SELECT * FROM w) "
    "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type, "
    "count(*) AS c, round(sum(value),3) AS s FROM f "
    "GROUP BY ws, event_type ORDER BY ws, event_type",
)
def q26(spark, sf):
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 3).alias("s"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "c",
            "s",
        )
        .transform(osort, table_rows(sf, "events"), "ws", "event_type")
    )


@_q(
    "q27_session_window",
    # gap-based sessionization (10 min) via lag, the batch-SQL equivalent
    # of Spark's session_window: windows are [ts, ts+gap), so a delta of
    # exactly the gap starts a NEW session (>=, not >); sums cast to
    # BIGINT because DuckDB's integer sum is HUGEINT, which reaches
    # pandas as float and breaks the driver's value hash
    "WITH d AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
    "(PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE OR "
    "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "THEN 1 ELSE 0 END AS new_s FROM events) "
    "SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, "
    "count(*) AS n_events "
    "FROM d GROUP BY user_id ORDER BY user_id",
)
def q27(spark, sf):
    ev = load(spark, sf, "events")
    n = spark.sparkContext.defaultParallelism
    # range exchange on user_id (see q14): the session-window agg and
    # the per-user rollup both reuse it (clustering satisfied), and the
    # output inherits range partitioning, so the presentation sort is
    # an in-partition sort with no exchange and no sampling job
    sessions = (
        ev.repartitionByRange(n, "user_id")
        .groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("cnt").alias("n_events"),
        )
        .sortWithinPartitions("user_id")
    )


@_q(
    "q28_approx_distinct",
    # approx_count_distinct is checked as a within-5%-of-exact predicate
    # (hash-stable), since the sketch value itself is engine-specific
    "SELECT CAST(1 AS INTEGER) AS ok",
)
def q28(spark, sf):
    ev = load(spark, sf, "events")
    agg = ev.agg(
        F.approx_count_distinct("user_id").alias("a"),
        F.countDistinct("user_id").alias("e"),
    )
    return agg.select(
        (F.abs(F.col("a") - F.col("e")) <= 0.05 * F.col("e"))
        .cast("int")
        .alias("ok")
    )


# -- LLM pipeline ------------------------------------------------------------


@_q(
    "q29_dedup_exact",
    "SELECT count(*) AS n FROM "
    "(SELECT min(doc_id) FROM documents GROUP BY md5(text))",
)
def q29(spark, sf):
    d = load(spark, sf, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id"))
        .agg(F.count("*").alias("n"))
    )


@_q(
    "q30_similarity_topk",
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), "
    "q AS (SELECT vec_id, emb FROM e WHERE vec_id < 5) "
    # `+ 0` normalizes IEEE -0.0 to +0.0 (r14): DuckDB's round keeps
    # the sign of a tiny negative, Spark's round (BigDecimal) never
    # yields -0.0 — the driver hashes "-0.0" != "0.0"
    "SELECT q.vec_id AS qid, e.vec_id AS vec_id, "
    "round(list_cosine_similarity(q.emb, e.emb), 6) + 0 AS sim "
    "FROM q CROSS JOIN e "
    "QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    "list_cosine_similarity(q.emb, e.emb) DESC, e.vec_id) <= 10 "
    "ORDER BY qid, sim DESC, vec_id",
)
def q30(spark, sf):
    from .functions.similarity import cosine_topk

    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    # catalog-stats hint (parquet footers, no job): 5 queries x the
    # corpus — cosine_topk's automatic kernel gate picks the einsum
    # path once the pair count clears the measured crossover
    # (similarity.VEC_CROSSOVER_PAIRS), so the sf1 win is the default
    # while sf0.1 keeps the JVM fold (r15, VERDICT r14 #9)
    return cosine_topk(
        q, e, k=10, pair_count_hint=5 * table_rows(sf, "embeddings")
    )


@_q(
    "q31_text_stats",
    # CAST: DuckDB integer sum is HUGEINT -> float64 in pandas, which
    # would hash-mismatch Spark's bigint
    "SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars, count(*) AS docs "
    "FROM documents GROUP BY lang ORDER BY lang",
)
def q31(spark, sf):
    d = load(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(F.sum("n_chars").alias("chars"), F.count("*").alias("docs"))
        .transform(psort, "lang")
    )


@_q(
    "q32_multimodal",
    "SELECT doc_id, octet_length(encode(text)) AS nbytes, md5(text) AS fp "
    "FROM documents ORDER BY doc_id",
)
def q32(spark, sf):
    from .functions.multimodal import with_blob_metadata

    d = load(spark, sf, "documents")
    # osort gates the pre-UDF layout on catalog stats: bounded corpus →
    # one-job gather (no range-sampling pass), at scale → the range
    # exchange ranged() would place
    blobs = osort(d, table_rows(sf, "documents"), "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    # mapInPandas is order-preserving per partition, so the ordered
    # layout survives the Arrow stage and no top-level sort re-executes
    # the Python workers for range sampling
    return with_blob_metadata(blobs, "blob").select(
        "doc_id", "meta.nbytes", "meta.fp"
    )


@_q(
    "q33_udf_surface",
    f"SELECT l_orderkey, CAST(round({REV_SQL}, 2) AS DOUBLE) AS net "
    "FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey",
)
def q33(spark, sf):
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        # r14: exact integer-cent arithmetic, the per-ROW member of the
        # rev_dec class.  The previous float path (floor(net*100+0.5))
        # agreed with the oracle's float round() on all 151 half-cent-
        # exact rows at sf0.01 only by floating-point accident — three
        # rounding semantics (Spark round, DuckDB round, floor+0.5)
        # coexisted on values sitting exactly ON the boundary.  Integer
        # cents x discount basis points is exact (<=1e11, well inside
        # int64), and (x + 50) // 100 is decimal HALF_UP for the
        # positive domain — bit-identical to the decimal oracle under
        # any batch split.  Still a vectorized Arrow kernel, which is
        # the surface this query exists to exercise.
        cents = np.rint(price.to_numpy() * 100).astype(np.int64)
        dbp = np.rint(discount.to_numpy() * 10000).astype(np.int64)
        net6 = cents * (10000 - dbp)  # exact net at scale 10^6
        # (net6 + 5000) // 10000 is HALF_UP only for net6 >= 0: floor
        # division rounds a NEGATIVE tie toward -inf while the decimal
        # oracle rounds away from zero.  Enforce the positive-domain
        # premise instead of assuming it (r14 advice) — a fixture with
        # negative prices or discounts > 1 must fail loudly, not
        # silently drift half a cent per tie row.
        if net6.size and net6.min() < 0:
            raise ValueError(
                "q33 integer-cent kernel requires non-negative net "
                "revenue (price >= 0, discount <= 1); got negative "
                "values — the HALF_UP shortcut does not hold there"
            )
        return pd.Series(((net6 + 5000) // 10000) / 100.0)

    li = load(spark, sf, "lineitem")
    return (
        # filter BELOW the ordering exchange (pushes to the scan); the
        # Arrow-batched UDF runs after it, once, order-preserving.
        # osort gates the layout on catalog stats (l_linenumber == 1
        # keeps one row per order): bounded → one-job gather, at scale
        # → the range exchange, exactly ranged()'s layout
        osort(
            li.filter(F.col("l_linenumber") == 1),
            table_rows(sf, "orders"),
            "l_orderkey",
        ).select(
            "l_orderkey",
            net_price("l_extendedprice", "l_discount").alias("net"),
        )
    )


# -- dedup / near-dup (LLM pipeline) -----------------------------------------

# exact 3-gram jaccard pairs, mirroring functions.dedup.shingles verbatim
_JACCARD_SQL = """
WITH w AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id AS id,
             array_to_string(ws[i+1:i+3], ' ') AS gram
      FROM w, unnest(range(greatest(len(ws)-3, 0)+1)) t(i)
      WHERE len(array_to_string(ws[i+1:i+3], ' ')) > 0),
n AS (SELECT id, count(*) AS ng FROM g GROUP BY id),
p AS (SELECT x.id AS a, y.id AS b, count(*) AS common
      FROM g x JOIN g y ON x.gram = y.gram AND x.id < y.id
      GROUP BY 1, 2)
SELECT p.a, p.b,
       round(common * 1.0 / (na.ng + nb.ng - common), 6) AS jac
FROM p JOIN n na ON na.id = p.a JOIN n nb ON nb.id = p.b
WHERE common * 1.0 / (na.ng + nb.ng - common) >= {thr}
ORDER BY a, b
"""


@_q("q36_minhash_neardup", _JACCARD_SQL.format(thr=0.8))
def q36(spark, sf):
    from .functions.dedup import minhash_lsh_pairs

    d = load(spark, sf, "documents")
    # max_bucket caps the quadratic pair fan-out of a pathological band
    # bucket (the 100 TB skew guard, opt-in — the function default is
    # exact recall); at fixture scale no bucket approaches it, so the
    # declared result remains exactly the oracle's Jaccard pairs.
    # verify_broadcast: candidates ≪ corpus here (and at any typical
    # dup rate), so the verification join streams the gram arrays past
    # a broadcast of the candidate sides instead of exchanging them;
    # dup-saturated corpora keep the default shuffle join.
    return minhash_lsh_pairs(
        d, threshold=0.8, n=3, k=64, bands=16, max_bucket=10_000,
        verify_broadcast=True,
    )


# _JACCARD_SQL with the stop-shingle guard mirrored: grams occurring in
# more than {max_df} docs are dropped BEFORE set sizes are counted,
# matching ngram_jaccard_pairs(max_df=...) exactly
_JACCARD_BOUNDED_SQL = """
WITH w AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
           FROM documents),
g0 AS (SELECT DISTINCT doc_id AS id,
             array_to_string(ws[i+1:i+3], ' ') AS gram
      FROM w, unnest(range(greatest(len(ws)-3, 0)+1)) t(i)
      WHERE len(array_to_string(ws[i+1:i+3], ' ')) > 0),
hot AS (SELECT gram FROM g0 GROUP BY gram HAVING count(*) > {max_df}),
g AS (SELECT * FROM g0 WHERE gram NOT IN (SELECT gram FROM hot)),
n AS (SELECT id, count(*) AS ng FROM g GROUP BY id),
p AS (SELECT x.id AS a, y.id AS b, count(*) AS common
      FROM g x JOIN g y ON x.gram = y.gram AND x.id < y.id
      GROUP BY 1, 2)
SELECT p.a, p.b,
       round(common * 1.0 / (na.ng + nb.ng - common), 6) AS jac
FROM p JOIN n na ON na.id = p.a JOIN n nb ON nb.id = p.b
WHERE common * 1.0 / (na.ng + nb.ng - common) >= {thr}
ORDER BY a, b
"""


@_q("q37_ngram_jaccard", _JACCARD_BOUNDED_SQL.format(thr=0.5, max_df=20))
def q37(spark, sf):
    """Bounded inverted-index Jaccard: ``max_df`` drops stop-shingles so
    no posting list can emit O(L²) pairs — the guard the r2 verdict
    flagged as implemented-but-undeclared.  max_df=20 actually fires at
    sf0.1 (59 grams exceed it; fixture max df is 25) and the oracle
    mirrors the identical drop, so exactness holds at every sf."""
    from .functions.dedup import ngram_jaccard_pairs

    d = load(spark, sf, "documents")
    return ngram_jaccard_pairs(
        d, threshold=0.5, n=3, max_df=20, sizes_broadcast=True
    )


def _simhash_expected(sf_dir: str, max_hamming: int, n: int = 3):
    """Independent brute-force oracle for q38: per-doc simhash from the
    pure-Python XXH64 mirror (functions/_xxh64.py, pinned byte-for-byte
    against ``F.xxhash64`` in tests/test_dedup.py) + all-pairs hamming.
    Shares NO code with the engine's Spark expressions — grams via
    re.split/join, votes/packing in plain ints."""
    import itertools
    import re

    import pyarrow.parquet as pq

    from .functions._xxh64 import xxh64

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pydict()
    sigs = {}
    for d, txt in zip(t["doc_id"], t["text"]):
        words = re.split(r"\s+", txt)
        grams = {
            g
            for i in range(max(len(words) - n, 0) + 1)
            if (g := " ".join(words[i : i + n]))
        }
        if not grams:
            continue  # shingle-less docs are excluded from candidacy
        votes = [0] * 64
        for g in grams:
            h = xxh64(g.encode("utf-8"))
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        sigs[d] = sum(1 << b for b in range(64) if votes[b] > 0)
    return sorted(
        (a, b, ham)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if (ham := bin(sigs[a] ^ sigs[b]).count("1")) <= max_hamming
    )


def _simhash_values_sql() -> str:
    """Literal-VALUES oracle (the q34/q81 pattern) computed lazily so it
    binds to the sf the harness actually runs: the driver compares at
    sf0.01 (the default), the local parity suite exports
    MANDOLINE_TEST_SF."""
    sf_dir = os.environ.get(ORACLE_SF_ENV, _DRIVER_SF)
    rows = _simhash_expected(sf_dir, max_hamming=3)
    if not rows:
        return (
            "SELECT * FROM (VALUES (0, 0, 0)) AS t(a, b, hamming) "
            "WHERE FALSE"
        )
    vals = ", ".join(f"({a},{b},{h})" for a, b, h in rows)
    return (
        f"SELECT * FROM (VALUES {vals}) AS t(a, b, hamming) ORDER BY a, b"
    )


@_q("q38_simhash_neardup", _simhash_values_sql)
def q38(spark, sf):
    """SimHash near-dup pairs in the EXACT pigeonhole regime:
    max_hamming = bands-1 = 3, where banding provably finds every pair
    (any ≤3-bit difference leaves at least one of 4 bands identical),
    so the declared result is exactly the all-pairs hamming scan — and
    the oracle IS that scan, recomputed independently in Python
    (pure-Python XXH64 + plain-int bit votes, `_simhash_expected`) and
    declared as a literal VALUES table.  Simhash is engine-defined
    (xxhash64 bit votes), so a portable SQL oracle can't exist; r2/r3
    measurements also ruled out a Jaccard-declared form (true
    Jaccard≥0.8 pairs carry hamming up to 12).  The heuristic regime
    (max_hamming > bands-1, recall<1) stays covered by
    tests/test_dedup.py.  No max_bucket here: the function default None
    is exact recall; 100 TB call sites opt into the skew guard."""
    from .functions.dedup import simhash_pairs

    d = load(spark, sf, "documents")
    return simhash_pairs(d, max_hamming=3, n=3, bands=4)


@_q(
    "q39_embedding_neardup",
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label "
    "FROM embeddings) "
    "SELECT x.vec_id AS a, y.vec_id AS b, "
    "round(list_cosine_similarity(x.emb, y.emb), 6) AS sim "
    "FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id "
    "WHERE list_cosine_similarity(x.emb, y.emb) >= 0.4 "
    "ORDER BY a, b",
)
def q39(spark, sf):
    from .functions.similarity import cosine_pairs

    e = load(spark, sf, "embeddings")
    return cosine_pairs(e, threshold=0.4, block_col="label")


@_q(
    "q40_ann_lsh_top1",
    # LSH buckets always contain the query itself, and cosine(self)=1
    # strictly dominates, so approximate top-1 must be exact: the query
    "SELECT vec_id AS qid, vec_id AS top_id FROM embeddings "
    "WHERE vec_id < 5 ORDER BY qid",
)
def q40(spark, sf):
    from .functions.similarity import cosine_topk_lsh

    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    # catalog-stats hint (parquet footers, no job): 5 queries x 9
    # probed buckets (n_probe_bits=1 default over 8 planes) x the
    # expected bucket population |corpus|/2^8 — the kernel gate stays
    # on the JVM fold until the candidate stream clears the measured
    # crossover (r16, VERDICT r15 #6; same pattern as q30/q66)
    top = cosine_topk_lsh(
        q, e, k=1, n_planes=8,
        pair_count_hint=5 * 9 * table_rows(sf, "embeddings") // 256,
    )
    return top.select("qid", F.col("vec_id").alias("top_id")).transform(psort, "qid")


# -- text analysis (LLM pipeline) --------------------------------------------


@_q(
    "q41_token_count",
    "SELECT doc_id, "
    "len(regexp_split_to_array(trim(text), '\\s+')) AS words, "
    "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) "
    "AS tokens FROM documents ORDER BY doc_id",
)
def q41(spark, sf):
    from .functions.text import token_count, word_count

    d = load(spark, sf, "documents")
    return ranged(d, "doc_id").select(
        "doc_id",
        word_count(F.col("text")).alias("words"),
        token_count(F.col("text")).alias("tokens"),
    )


@_q(
    "q42_quality_score",
    "SELECT doc_id, round("
    "least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.7"
    " + greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(text, "
    "'[^A-Za-z0-9\\s]', '', 'g'))) * 1.0 / length(text)) * 5.0) * 0.3"
    ", 6) AS q FROM documents ORDER BY doc_id",
)
def q42(spark, sf):
    from .functions.text import quality_score

    d = load(spark, sf, "documents")
    return ranged(d, "doc_id").select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )


@_q(
    "q43_lang_id",
    "WITH s AS (SELECT doc_id, "
    "regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents), "
    "h AS (SELECT doc_id, "
    "len(list_filter(ws, w -> w IN "
    "('the','and','of','to','a','in','is','that'))) AS en, "
    "len(list_filter(ws, w -> w IN "
    "('der','die','das','und','ist','nicht','ein','zu'))) AS de, "
    "len(list_filter(ws, w -> w IN "
    "('el','la','de','que','y','en','un','es'))) AS es, "
    "len(list_filter(ws, w -> w IN "
    "('le','la','et','les','des','un','une','est'))) AS fr FROM s) "
    "SELECT doc_id, CASE WHEN fr > greatest(en, de, es) THEN 'fr' "
    "WHEN es > greatest(en, de) THEN 'es' "
    "WHEN de > en THEN 'de' ELSE 'en' END AS pred "
    "FROM h ORDER BY doc_id",
)
def q43(spark, sf):
    from .functions.text import lang_id

    d = load(spark, sf, "documents")
    return ranged(d, "doc_id").select(
        "doc_id", lang_id(F.col("text")).alias("pred")
    )


@_q(
    "q44_fingerprint",
    "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
    "list_filter(regexp_split_to_array(regexp_replace(lower(text), "
    "'[^a-z0-9\\s]', '', 'g'), '\\s+'), w -> len(w) > 0))), ' ')) AS fp "
    "FROM documents ORDER BY doc_id",
)
def q44(spark, sf):
    from .functions.text import fingerprint

    d = load(spark, sf, "documents")
    return ranged(d, "doc_id").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


# -- array store (the mandoline surface itself) ------------------------------

_ARRAY_DIMS = (5, 4, 3)
# (session id, store root) → read-through Connection; see _array_fixture
_ARRAY_CONNS: dict = {}
# (session id, sf dir, n_cells) → trained IVF centroids; see q66
_IVF_CENTROIDS: dict = {}


def _array_expected(version: int) -> list[tuple[int, int, int, int]]:
    """Pure-Python oracle of the deterministic array fixture: the same
    slab-merge the engine performs, mirrored in loops."""
    X, Y, T = _ARRAY_DIMS
    out = {}
    for x in range(X):
        for y in range(Y):
            for t in range(T):
                out[(x, y, t)] = x * 10000 + y * 100 + t
    if version >= 2:
        for x in range(1, 4):
            for y in range(1, 3):
                for t in range(0, 2):
                    out[(x, y, t)] = 500000 + x * 10000 + y * 100 + t
    return [(x, y, t, v) for (x, y, t), v in sorted(out.items())]


def _array_values_sql(version: int) -> str:
    rows = ", ".join(
        f"({x},{y},{t},{v})" for x, y, t, v in _array_expected(version)
    )
    return (
        f"SELECT * FROM (VALUES {rows}) AS t(dim0, dim1, dim2, value) "
        "ORDER BY dim0, dim1, dim2"
    )


def _array_fixture(spark):
    """Build (once per filesystem) the two-version deterministic array
    dataset used by q34/q35."""
    import numpy as np

    from . import writer
    from .core import slab as sb
    from .core import slice as sl
    from .store import Store

    root = "/tmp/mandoline_spark_arrayq"
    marker = os.path.join(root, ".done")
    store = Store(spark, root)
    if not os.path.exists(marker):
        store.destroy_dataset("arr")
        os.makedirs(root, exist_ok=True)
        conn = store.create_dataset("arr")
        X, Y, T = _ARRAY_DIMS
        spec = {
            "dimensions": {"x": X, "y": Y, "t": T},
            "chunk-dimensions": {"x": 2, "y": 2, "t": 2},
            "variables": {
                "v": {"type": "int", "shape": ["x", "y", "t"], "fill-value": -1}
            },
        }
        base = np.fromfunction(
            lambda x, y, t: x * 10000 + y * 100 + t, (X, Y, T), dtype=np.int64
        ).astype(np.int32)
        tok = conn.add_version(spec)
        writer.write_variable(
            conn, tok, "v", [sb.Slab(base, sl.mk_slice((0, 0, 0), (X, Y, T)))]
        )
        conn.finish_version(tok)
        tok2 = conn.add_version(spec)
        patch = 500000 + base[1:4, 1:3, 0:2]
        writer.write_variable(
            conn,
            tok2,
            "v",
            [sb.Slab(patch, sl.mk_slice((1, 1, 0), (4, 3, 2)))],
        )
        conn.finish_version(tok2)
        with open(marker, "w") as f:
            f.write("ok")
    # One read-through connection per (session, store) — the reference's
    # own deployment shape (CachingChunkStore / CachingIndex wrap every
    # reader connection, impl.clj:127-162): the index and chunk table
    # DataFrames are resolved + .cache()d once, so repeated array
    # queries pay the catalog jobs (parquet footer listing, index
    # resolution) exactly once per session instead of per query.  The
    # fixture is immutable after the marker lands, so the memo never
    # serves stale catalog state.
    key = (id(spark), root)
    conn = _ARRAY_CONNS.get(key)
    if conn is None:
        conn = store.connect("arr", cache_reads=True)
        _ARRAY_CONNS[key] = conn
    return conn


def _array_cells(spark, version_nth: int) -> DataFrame:
    from . import reader

    conn = _array_fixture(spark)
    token = reader.on_nth_version(conn, version_nth)
    # the distributed exploded cell view (SURVEY §1.4) — the bridge from
    # the array store to the relational surface.  psort, not orderBy:
    # the declared request is a bounded presentation slice, and a
    # global orderBy's range sampler would RE-EXECUTE the whole
    # chunk-decode pipeline once just to pick split points (one extra
    # job per read; the same double-execution ranged() avoids for the
    # document queries).  Corpus-scale cell scans should keep orderBy /
    # ranged() on their own keys.
    return psort(reader.cells_df(conn, token, "v"), "dim0", "dim1", "dim2")


@_q("q34_array_slice", _array_values_sql(2))
def q34(spark, sf):
    return _array_cells(spark, -1)


@_q("q35_array_timetravel", _array_values_sql(1))
def q35(spark, sf):
    return _array_cells(spark, 0)


# -- composite operators (operators/joins.py) ---------------------------------


@_q(
    "q45_asof_join",
    "WITH clicks AS (SELECT event_id, user_id, ts FROM events "
    "WHERE event_type='click'), "
    "views AS (SELECT user_id, ts, max(event_id) AS view_id FROM events "
    "WHERE event_type='view' GROUP BY user_id, ts) "
    "SELECT c.event_id, c.user_id, v.view_id FROM clicks c "
    "ASOF LEFT JOIN views v ON c.user_id = v.user_id AND v.ts <= c.ts "
    "ORDER BY c.event_id",
)
def q45(spark, sf):
    """For each click, the user's most recent prior (or simultaneous)
    view — the as-of join (operators/joins.py) against DuckDB's native
    ASOF JOIN as the oracle.

    r15: the old ``groupBy(user_id, ts).agg(max(event_id))``
    pre-reduction of the view side is folded into the as-of window's
    own sort via ``tie_col`` — at equal (user, ts) the carried last()
    row IS the max-view_id row, so the pre-aggregation computed the
    same thing one hash exchange earlier.  Plan: 3 Exchange → 2
    (plans/r15/q45_asof_join_*.txt); the remaining two are the
    operator's one ``by``-key shuffle and the presentation sort.
    Results identical (same matched row by the tie argument; oracle
    unchanged)."""
    from .operators import asof_join

    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join(
        clicks, views, on="ts", by="user_id", tie_col="view_id"
    )
    return out.select(
        "event_id", "user_id", F.col("view_id_r").alias("view_id")
    ).transform(osort, table_rows(sf, "events"), "event_id")


@_q(
    "q46_range_join",
    "WITH b AS (SELECT r_regionkey AS iid, r_regionkey*60000.0 AS lo, "
    "r_regionkey*60000.0+80000.0 AS hi FROM region) "
    "SELECT iid, count(*) AS c FROM b JOIN orders "
    "ON lo <= o_totalprice AND o_totalprice < hi GROUP BY iid ORDER BY iid",
)
def q46(spark, sf):
    """Point-in-interval range join via bucketized equi-join
    (operators/joins.py) vs the naive theta-join oracle."""
    from .operators import range_join

    orders = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    bands = load(spark, sf, "region").select(
        F.col("r_regionkey").alias("iid"),
        (F.col("r_regionkey") * 60000.0).alias("lo"),
        (F.col("r_regionkey") * 60000.0 + 80000.0).alias("hi"),
    )
    joined = range_join(orders, bands, "o_totalprice", "lo", "hi", 20000.0)
    return (
        joined.groupBy("iid").agg(F.count("*").alias("c")).transform(psort, "iid")
    )


@_q(
    "q47_topk_per_group",
    "SELECT o_orderpriority, o_orderkey, o_totalprice FROM ("
    "SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER ("
    "PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) "
    "AS rn FROM orders) t WHERE rn <= 3 "
    "ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey",
)
def q47(spark, sf):
    """Grouped top-k (operators/joins.py) — k rows per group survive."""
    from .operators import topk_per_group

    orders = load(spark, sf, "orders")
    top = topk_per_group(
        orders,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )
    return top.select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).transform(psort, 
        "o_orderpriority", F.col("o_totalprice").desc(), "o_orderkey"
    )


@_q(
    "q48_union_except",
    "SELECT k FROM (SELECT c_nationkey AS k FROM customer UNION ALL "
    "SELECT s_nationkey FROM supplier EXCEPT "
    "SELECT n_nationkey FROM nation WHERE n_regionkey = 0) t ORDER BY k",
)
def q48(spark, sf):
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    n = (
        load(spark, sf, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("k"))
    )
    # subtract == SQL EXCEPT (set semantics); exceptAll would only
    # cancel per-occurrence
    return c.unionAll(s).subtract(n).transform(psort, "k")


@_q(
    "q49_pivot",
    "SELECT o_orderpriority, "
    "count(*) FILTER (WHERE o_orderstatus = 'F') AS f, "
    "count(*) FILTER (WHERE o_orderstatus = 'O') AS o, "
    "count(*) FILTER (WHERE o_orderstatus = 'P') AS p "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q49(spark, sf):
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("f"),
            F.col("O").alias("o"),
            F.col("P").alias("p"),
        )
        .transform(psort, "o_orderpriority")
    )


@_q(
    "q50_percentiles",
    "SELECT l_linestatus, "
    "round(quantile_cont(l_quantity, 0.5), 4) AS p50, "
    "round(quantile_cont(l_quantity, 0.9), 4) AS p90 "
    "FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus",
)
def q50(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90"),
        )
        .transform(psort, "l_linestatus")
    )


@_q(
    "q51_scalar_subquery",
    "SELECT count(*) AS n FROM lineitem "
    "WHERE l_quantity = (SELECT max(l_quantity) FROM lineitem)",
)
def q51(spark, sf):
    li = load(spark, sf, "lineitem")
    # broadcast the 1-row aggregate instead of collecting it: the whole
    # query stays one declarative plan (no driver round-trip)
    mx = li.agg(F.max("l_quantity").alias("_mx"))
    return (
        li.join(F.broadcast(mx))
        .filter(F.col("l_quantity") == F.col("_mx"))
        .agg(F.count("*").alias("n"))
    )


@_q(
    "q52_exists_correlated",
    "SELECT c_custkey FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_totalprice > 300000) ORDER BY c_custkey",
)
def q52(spark, sf):
    """Correlated EXISTS — planned as a left-semi hash join on the
    correlation key, so it shuffles once on o_custkey and never
    materializes the subquery per outer row."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .transform(osort, table_rows(sf, "customer"), "c_custkey")
    )


@_q(
    "q53_lateral_explode",
    # `+ 0` maps -0.0 to +0.0 (see q30's oracle note): a tiny negative
    # embedding element rounds to DuckDB -0.0 but Spark 0.0 — caught by
    # the r14 exact-string parity suite at sf0.001
    "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos, "
    "round(unnest(embedding), 4) + 0 AS val "
    "FROM embeddings WHERE vec_id < 32 ORDER BY vec_id, pos",
)
def q53(spark, sf):
    """Lateral array expansion with element position (posexplode ≡
    UNNEST WITH ORDINALITY).  The filter lands before the generator, so
    only 32 vectors ever explode."""
    e = load(spark, sf, "embeddings").filter(F.col("vec_id") < 32)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "_v"))
        .select("vec_id", "pos", F.round("_v", 4).alias("val"))
        # 32 vectors x dim rows — bounded by the literal filter at any
        # scale, so the gather sort needs no stats gate
        .transform(psort, "vec_id", "pos")
    )


@_q(
    "q54_window_navigation",
    "SELECT o_orderkey, CAST(ntile(4) OVER w AS INTEGER) AS tile, "
    "first_value(o_orderkey) OVER w AS fv, "
    "round(cume_dist() OVER w, 6) AS cd FROM orders "
    "WINDOW w AS (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey",
)
def q54(spark, sf):
    """Navigation/distribution window functions (ntile, first_value,
    cume_dist) sharing one window spec — one shuffle + one sort."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("tile"),
            F.first("o_orderkey").over(w).alias("fv"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .transform(osort, table_rows(sf, "orders"), "o_orderkey")
    )


@_q(
    "q55_string_distance",
    "SELECT p_partkey, levenshtein(substr(p_name, 1, 8), 'standard') AS d "
    "FROM part WHERE p_partkey <= 200 ORDER BY p_partkey",
)
def q55(spark, sf):
    return (
        load(spark, sf, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.levenshtein(
                F.substring("p_name", 1, 8), F.lit("standard")
            ).alias("d"),
        )
        .transform(osort, table_rows(sf, "part"), "p_partkey")
    )


@_q(
    "q56_grouping_sets",
    "SELECT coalesce(l_returnflag, 'ALL') AS rf, "
    "coalesce(l_linestatus, 'ALL') AS ls, "
    "CAST(grouping(l_returnflag) AS INTEGER) AS g_rf, count(*) AS c "
    "FROM lineitem GROUP BY GROUPING SETS "
    "((l_returnflag), (l_linestatus), ()) ORDER BY rf, ls",
)
def q56(spark, sf):
    """Explicit GROUPING SETS (beyond the rollup/cube shorthands of
    Q12/Q13) with the grouping() marker distinguishing data NULLs from
    subtotal NULLs."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.count("*").alias("c"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "g_rf",
            "c",
        )
        .transform(psort, "rf", "ls")
    )


@_q(
    "q57_filtered_agg",
    "SELECT o_orderpriority, "
    "count(*) FILTER (WHERE o_orderstatus = 'F') AS nf, "
    "round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2) "
    "AS big_avg, "
    "count(*) FILTER (WHERE o_totalprice > 200000) AS n_big "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q57(spark, sf):
    """Filtered aggregates — all three conditions evaluate in ONE
    hash-aggregate pass (no self-joins, no separate scans)."""
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("nf"),
            F.round(
                F.avg(
                    F.when(
                        F.col("o_totalprice") > 100000, F.col("o_totalprice")
                    )
                ),
                2,
            ).alias("big_avg"),
            F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias(
                "n_big"
            ),
        )
        .transform(psort, "o_orderpriority")
    )


@_q(
    "q58_date_arith",
    "SELECT o_orderkey, "
    "date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-01-01') AS dd, "
    "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS ld, "
    "strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS d30 "
    "FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey",
)
def q58(spark, sf):
    """Date arithmetic: day differences, month-end snapping, date
    shifting (dates serialized to strings so both engines hash the same
    canonical form)."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("1995-01-01").cast("date"), d).alias("dd"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("ld"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("d30"),
    ).transform(osort, table_rows(sf, "orders"), "o_orderkey")


@_q(
    "q59_array_hof",
    "SELECT vec_id, "
    "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 3) "
    "AS ss, "
    "CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS npos "
    "FROM embeddings WHERE vec_id < 100 ORDER BY vec_id",
)
def q59(spark, sf):
    """Higher-order array functions: fold (aggregate) and filter run
    JVM-side per element with no Python round-trip.  Both engines fold
    left-to-right, so the double sums are bit-identical."""
    e = load(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    return (
        e.select(
            "vec_id",
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x,
                ),
                3,
            ).alias("ss"),
            F.size(F.filter("embedding", lambda x: x > 0))
            .cast("long")
            .alias("npos"),
        )
        .transform(osort, table_rows(sf, "embeddings"), "vec_id")
    )


@_q(
    "q60_approx_percentile",
    # percentile_approx is a mergeable quantile sketch (Greenwald-Khanna
    # in Spark); like Q28 the sketch value is engine-specific, so the
    # declared check is a within-rank-tolerance predicate against the
    # exact per-group quantile, hash-stable on both engines.
    "SELECT CAST(1 AS INTEGER) AS ok",
)
def q60(spark, sf):
    """Approximate percentile: per-group P50/P99 from the sketch must
    sit within the exact-rank tolerance window of each group (P50 in
    ranks (n-1)·[0.45, 0.55], P99 in (n-1)·[0.98, 1.0]) — the
    correctness contract of a rank-error sketch.

    The exact side is a RANK-COUNT check, not an exact quantile: the
    sketch value v occupies the rank interval [count(x<v),
    count(x≤v)-1] of its group's sorted order (approx_percentile
    returns actual data values), and the contract holds iff that
    interval intersects the tolerance window.  Counting conditional
    sums needs no sort and no per-group value buffer — earlier shapes
    paid either the ``percentile`` aggregate (every value of a group
    in one unspillable map: the per-group OOM at scale) or a window
    rank sort (full per-group sort with only |groups|-way parallelism
    — the measured sf0.1 bottleneck).  Here both passes are plain
    hash aggregates with map-side partials and full scan parallelism;
    the 3-row sketch result broadcasts into the count pass.  The
    sketch itself (QuantileSummaries insert+compress per row) is the
    measured floor of this query; everything else is two cheap scans."""
    li = load(spark, sf, "lineitem")
    v = F.col("l_extendedprice").cast("double")
    sk = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)"
        ).alias("a"),
        F.count("*").alias("n"),
    )
    j = li.select("l_returnflag", v.alias("v")).join(
        F.broadcast(sk), "l_returnflag"
    )
    per = j.groupBy("l_returnflag").agg(
        F.sum((F.col("v") < F.col("a")[0]).cast("long")).alias("lt0"),
        F.sum((F.col("v") <= F.col("a")[0]).cast("long")).alias("le0"),
        F.sum((F.col("v") < F.col("a")[1]).cast("long")).alias("lt1"),
        F.sum((F.col("v") <= F.col("a")[1]).cast("long")).alias("le1"),
        F.first("n").alias("n"),
    )
    nm1 = (F.col("n") - 1).cast("double")
    ok = (
        (F.col("lt0") <= nm1 * 0.55)
        & ((F.col("le0") - 1) >= nm1 * 0.45)
        & (F.col("lt1") <= nm1 * 1.0)
        & ((F.col("le1") - 1) >= nm1 * 0.98)
    ).cast("int")
    return per.agg(F.min(ok).alias("ok"))


@_q(
    "q61_unpivot",
    "WITH wide AS (SELECT o_orderpriority, "
    "count(*) FILTER (WHERE o_orderstatus = 'F') AS f, "
    "count(*) FILTER (WHERE o_orderstatus = 'O') AS o, "
    "count(*) FILTER (WHERE o_orderstatus = 'P') AS p "
    "FROM orders GROUP BY o_orderpriority) "
    "SELECT o_orderpriority, status, n FROM wide "
    "UNPIVOT (n FOR status IN (f, o, p)) "
    "ORDER BY o_orderpriority, status",
)
def q61(spark, sf):
    """Unpivot / melt (the inverse of Q49's pivot): wide per-status
    counts back to long form."""
    o = load(spark, sf, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("f"),
            F.col("O").alias("o"),
            F.col("P").alias("p"),
        )
    )
    return wide.unpivot(
        ["o_orderpriority"], ["f", "o", "p"], "status", "n"
    ).transform(psort, "o_orderpriority", "status")


@_q(
    "q62_string_agg",
    "SELECT n_regionkey AS rk, "
    "string_agg(n_name, ',' ORDER BY n_name) AS names "
    "FROM nation GROUP BY n_regionkey ORDER BY rk",
)
def q62(spark, sf):
    """Ordered string aggregation (listagg): collect + sort + join keeps
    the result deterministic under any shuffle order."""
    n = load(spark, sf, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("rk"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("names")
        )
        .transform(psort, "rk")
    )


@_q(
    "q63_map_funcs",
    # the oracle states the expected VALUE; the Spark side computes it
    # through map construction + lookup (DuckDB's MAP element_at wraps
    # values in a list, so its literal map form can't hash-match)
    "SELECT o_orderkey, o_orderpriority AS pri FROM orders "
    "WHERE o_orderkey <= 1000 ORDER BY o_orderkey",
)
def q63(spark, sf):
    """Map column functions: build a map from column values, look up by
    key (map_from_arrays/create_map + element_at)."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") <= 1000)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("pri"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey", F.element_at(m, F.lit("pri")).alias("pri")
    ).transform(osort, table_rows(sf, "orders"), "o_orderkey")


@_q(
    "q64_regexp_extract",
    "SELECT p_partkey, regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS w2 "
    "FROM part WHERE p_partkey <= 500 ORDER BY p_partkey",
)
def q64(spark, sf):
    """Regexp group extraction (JVM regexp engine on both sides, same
    capture-group semantics)."""
    p = load(spark, sf, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("w2"),
    ).transform(osort, table_rows(sf, "part"), "p_partkey")


@_q(
    "q65_pipeline_compose",
    # the full LLM-data curation funnel in one declarative plan:
    # quality-score filter -> language gate -> exact near-dup collapse
    "WITH scored AS (SELECT doc_id, text, lang, round("
    "least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.7"
    " + greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(text, "
    "'[^A-Za-z0-9\\s]', '', 'g'))) * 1.0 / length(text)) * 5.0) * 0.3, 6) AS q "
    "FROM documents), "
    "kept AS (SELECT * FROM scored WHERE q >= 0.5 AND lang = 'en'), "
    "dedup AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)) "
    "SELECT count(*) AS survivors, "
    "(SELECT count(*) FROM documents) AS total FROM dedup",
)
def q65(spark, sf):
    """Composition capstone: the curation funnel every training-data
    pipeline runs — quality scoring, language gating, and exact-hash
    dedup — as ONE Catalyst plan and ONE corpus scan: the funnel gate
    becomes a per-row flag, the md5 groupBy counts every text group's
    size and whether any member passed, and a scalar re-aggregate
    yields survivors (groups with a passing member — a group's members
    share text hence q, so this equals distinct-md5-of-kept) and total
    (sum of group sizes) together.  The r6 shape paid a second corpus
    scan + a broadcast-join job for the total."""
    from .functions.text import quality_score

    d = load_documents_wide(spark, sf)
    keep = (quality_score(F.col("text")) >= 0.5) & (F.col("lang") == "en")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(
            F.count("*").alias("_sz"),
            F.max(keep.cast("int")).alias("_any"),
        )
        .agg(
            F.sum("_any").alias("survivors"),
            F.sum("_sz").alias("total"),
        )
    )


@_q(
    "q66_ann_ivf_top1",
    # IVF probe #1 for a corpus vector is always its own assigned cell
    # (probe ranking == assignment metric), and cosine(self)=1 strictly
    # dominates, so approximate top-1 must be exact: the query itself.
    "SELECT vec_id AS qid, vec_id AS top_id FROM embeddings "
    "WHERE vec_id < 5 ORDER BY qid",
)
def q66(spark, sf):
    """IVF approximate nearest neighbor — the centroid-routing scale
    path next to Q40's LSH variant: k-means cells over the corpus, each
    query probes its n_probe nearest cells and re-ranks exactly."""
    from .functions.similarity import ivf_topk, train_ivf_centroids

    e = load(spark, sf, "embeddings")
    # The quantizer is INDEX state: train once per (session, corpus),
    # reuse for every search — the deployment contract
    # train_ivf_centroids documents.  The memo key is the corpus
    # location; the fixture tables are immutable.
    key = (id(spark), sf, 8)
    cents = _IVF_CENTROIDS.get(key)
    if cents is None:
        cents = _IVF_CENTROIDS[key] = train_ivf_centroids(e, n_cells=8)
    q = e.filter(F.col("vec_id") < 5)
    top = ivf_topk(q, e, k=1, n_cells=8, n_probe=2, centroids=cents)
    return top.select("qid", F.col("vec_id").alias("top_id")).transform(psort, "qid")


@_q(
    "q67_hash_sample",
    "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS s FROM orders "
    "WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'",
)
def q67(spark, sf):
    """Deterministic hash-based sampling (~1/16 of rows): the
    reproducible alternative to rand()-sampling for pipeline reruns —
    the same rows are sampled on every engine and every run."""
    o = load(spark, sf, "orders")
    key = F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    return o.filter(F.substring(key, 1, 1) == "0").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("s"),
    )


@_q(
    "q68_stratified_sample",
    "SELECT o_orderpriority, o_orderkey FROM orders "
    "QUALIFY row_number() OVER (PARTITION BY o_orderpriority "
    "ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) <= 2 "
    "ORDER BY o_orderpriority, o_orderkey",
)
def q68(spark, sf):
    """Stratified deterministic sampling: 2 rows per stratum, chosen by
    hash order — per-group uniform, reproducible, one window pass."""
    o = load(spark, sf, "orders")
    key = F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    w = Window.partitionBy("o_orderpriority").orderBy(key, F.col("o_orderkey"))
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
        .select("o_orderpriority", "o_orderkey")
        .transform(psort, "o_orderpriority", "o_orderkey")
    )


# fixed-width sortable key: (price cents, orderkey) — string order ==
# numeric order, so max_by/min_by ties are impossible by construction
_Q69_KEY_SQL = (
    "lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 12, '0')"
    " || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')"
)


@_q(
    "q69_minmax_by",
    f"SELECT o_orderpriority, max_by(o_orderkey, {_Q69_KEY_SQL}) AS best, "
    f"min_by(o_orderkey, {_Q69_KEY_SQL}) AS worst "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q69(spark, sf):
    """max_by/min_by aggregates (argmax/argmin in one hash-agg pass, no
    self-join back to the winning row)."""
    o = load(spark, sf, "orders")
    key = F.concat(
        F.lpad(
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("string"),
            12,
            "0",
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return (
        o.withColumn("_k", key)
        .groupBy("o_orderpriority")
        .agg(
            F.expr("max_by(o_orderkey, _k)").alias("best"),
            F.expr("min_by(o_orderkey, _k)").alias("worst"),
        )
        .transform(psort, "o_orderpriority")
    )


@_q(
    "q70_stats_agg",
    "SELECT l_returnflag, "
    # `+ 0` on the signable stats (see q30's oracle note on -0.0)
    "round(corr(l_quantity, l_extendedprice), 4) + 0 AS r, "
    "round(covar_samp(l_quantity, l_extendedprice), 2) + 0 AS cv, "
    "round(stddev_samp(l_quantity), 4) AS sd, "
    "round(var_samp(l_quantity), 4) AS vr "
    "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
)
def q70(spark, sf):
    """Statistical aggregates (correlation, covariance, stddev,
    variance) — one hash-agg pass, mergeable partials."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("r"),
            F.round(
                F.covar_samp("l_quantity", "l_extendedprice"), 2
            ).alias("cv"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd"),
            F.round(F.var_samp("l_quantity"), 4).alias("vr"),
        )
        .transform(psort, "l_returnflag")
    )


@_q(
    "q71_bitwise_agg",
    "SELECT o_orderpriority, bit_and(o_custkey) AS ba, "
    "bit_or(o_custkey) AS bo, bit_xor(o_custkey) AS bx "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q71(spark, sf):
    """Bitwise aggregates (bit_and/bit_or/bit_xor) — set-membership and
    flag-folding primitives."""
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("bit_and(o_custkey)").alias("ba"),
            F.expr("bit_or(o_custkey)").alias("bo"),
            F.expr("bit_xor(o_custkey)").alias("bx"),
        )
        .transform(psort, "o_orderpriority")
    )


@_q(
    "q72_histogram",
    # width_bucket(v, 0, 600000, 12) spelled as arithmetic so the same
    # expression runs on both engines: floor(v/50000)+1 clamped to 13
    "SELECT CAST(least(floor(o_totalprice / 50000), 12) + 1 AS BIGINT) "
    "AS bucket, count(*) AS c FROM orders GROUP BY bucket ORDER BY bucket",
)
def q72(spark, sf):
    """Equi-width histogram via width_bucket — the one-pass profiling
    primitive (no per-bucket scans)."""
    o = load(spark, sf, "orders")
    return (
        o.groupBy(
            F.width_bucket(
                "o_totalprice", F.lit(0), F.lit(600000), F.lit(12)
            ).alias("bucket")
        )
        .agg(F.count("*").alias("c"))
        .transform(psort, "bucket")
    )


@_q(
    "q73_sequence_explode",
    "SELECT n, count(*) AS c FROM (SELECT unnest(range(1, l_linenumber + 1)) "
    "AS n FROM lineitem) GROUP BY n ORDER BY n",
)
def q73(spark, sf):
    """Row-generating sequence explode (generate_series/UNNEST):
    per-row ranges expanded and re-aggregated."""
    li = load(spark, sf, "lineitem")
    return (
        li.select(
            F.explode(
                F.sequence(F.lit(1), F.col("l_linenumber"))
            ).alias("n")
        )
        .groupBy("n")
        .agg(F.count("*").alias("c"))
        .transform(psort, "n")
    )


@_q(
    "q74_regression_agg",
    "SELECT l_returnflag, "
    "round(regr_slope(l_extendedprice, l_quantity), 4) AS slope, "
    "round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept, "
    "round(regr_r2(l_extendedprice, l_quantity), 6) AS r2, "
    "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
)
def q74(spark, sf):
    """Linear-regression aggregates (slope/intercept/R²) — one pass,
    mergeable moment sketches."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.regr_slope("l_extendedprice", "l_quantity"), 4
            ).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 2
            ).alias("icept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
                "r2"
            ),
            F.regr_count("l_extendedprice", "l_quantity")
            .cast("bigint")
            .alias("n"),
        )
        .transform(psort, "l_returnflag")
    )


@_q(
    "q75_cross_join",
    "SELECT r_name, n_name FROM region CROSS JOIN nation "
    "ORDER BY r_name, n_name",
)
def q75(spark, sf):
    """Explicit cartesian product (both sides tiny — broadcast nested
    loop, never a shuffled cartesian at scale)."""
    r = load(spark, sf, "region").select("r_name")
    n = load(spark, sf, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n)).transform(psort, "r_name", "n_name")


@_q(
    "q76_month_arith",
    "SELECT o_orderkey, "
    "strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') "
    "AS m2, "
    "CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS qtr, "
    "strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d') "
    "AS qstart FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey",
)
def q76(spark, sf):
    """Month/quarter arithmetic (add_months with month-end clamping,
    quarter extraction and truncation) — beyond Q58's day math."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("m2"),
        F.quarter(d).alias("qtr"),
        F.date_format(
            F.date_trunc("quarter", d).cast("date"), "yyyy-MM-dd"
        ).alias("qstart"),
    ).transform(osort, table_rows(sf, "orders"), "o_orderkey")


@_q(
    "q77_string_shaping",
    "SELECT p_partkey, lpad(p_brand, 12, '*') AS lp, "
    "translate(p_brand, 'Brand#', 'brAND-') AS tr, reverse(p_type) AS rv, "
    "replace(p_name, ' ', '_') AS rp "
    "FROM part WHERE p_partkey <= 300 ORDER BY p_partkey",
)
def q77(spark, sf):
    """String shaping functions (pad/translate/reverse/replace) beyond
    Q19's upper/substr/like."""
    p = load(spark, sf, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.translate("p_brand", "Brand#", "brAND-").alias("tr"),
        F.reverse("p_type").alias("rv"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rp"),
    ).transform(osort, table_rows(sf, "part"), "p_partkey")


@_q(
    "q78_array_set_ops",
    "WITH t AS (SELECT r_regionkey AS rk, range(r_regionkey, r_regionkey + 6)"
    " AS a, range(r_regionkey + 3, r_regionkey + 9) AS b FROM region) "
    "SELECT rk, array_to_string(list_sort(list_distinct(list_concat(a, b))), "
    "',') AS u, array_to_string(list_sort(list_intersect(a, b)), ',') AS i, "
    "array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))),"
    " ',') AS d FROM t ORDER BY rk",
)
def q78(spark, sf):
    """Array set algebra (union/intersect/except), serialized to sorted
    CSV so both engines hash one canonical form."""
    r = load(spark, sf, "region").select(
        F.col("r_regionkey").alias("rk"),
        F.sequence(
            F.col("r_regionkey"), F.col("r_regionkey") + 5
        ).alias("a"),
        F.sequence(
            F.col("r_regionkey") + 3, F.col("r_regionkey") + 8
        ).alias("b"),
    )
    return r.select(
        "rk",
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("u"),
        F.array_join(
            F.array_sort(F.array_intersect("a", "b")), ","
        ).alias("i"),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("d"),
    ).transform(psort, "rk")


@_q(
    "q79_dedup_keep_best",
    "SELECT doc_id, n_chars FROM documents "
    "QUALIFY row_number() OVER (PARTITION BY md5(text) "
    "ORDER BY n_chars DESC, doc_id) = 1 ORDER BY doc_id",
)
def q79(spark, sf):
    """Exact dedup keeping the BEST representative per content cluster
    (longest doc, ties to lowest id) — the curation form of Q29, one
    window pass over the hash clusters."""
    d = load(spark, sf, "documents")
    w = Window.partitionBy(
        F.md5(F.col("text").cast("binary"))
    ).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "n_chars")
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q80_length_histogram",
    "SELECT CAST(least(floor(len(regexp_split_to_array(trim(text), "
    "'\\s+')) / 20), 10) AS BIGINT) AS bucket, count(*) AS docs "
    "FROM documents GROUP BY bucket ORDER BY bucket",
)
def q80(spark, sf):
    """Corpus profiling: document word-length histogram — the
    size-distribution pass every curation pipeline runs before
    filtering."""
    from .functions.text import word_count

    d = load_documents_wide(spark, sf)
    bucket = F.least(
        F.floor(word_count(F.col("text")) / 20), F.lit(10)
    ).cast("bigint")
    return (
        d.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("docs"))
        .transform(psort, "bucket")
    )


@_q(
    "q81_array_version_diff",
    # both versions' expected cells as literal tables (the same numpy
    # oracle as q34/q35), joined on coordinates
    "WITH v1 AS (SELECT * FROM ({v1}) ), v2 AS (SELECT * FROM ({v2}) ) "
    "SELECT count(*) AS n_changed, "
    "CAST(sum(v2.value - v1.value) AS BIGINT) AS delta_sum "
    "FROM v1 JOIN v2 USING (dim0, dim1, dim2) "
    "WHERE v1.value != v2.value".format(
        v1="SELECT * FROM (VALUES {}) AS t(dim0, dim1, dim2, value)".format(
            ", ".join(
                f"({x},{y},{t},{v})" for x, y, t, v in _array_expected(1)
            )
        ),
        v2="SELECT * FROM (VALUES {}) AS t(dim0, dim1, dim2, value)".format(
            ", ".join(
                f"({x},{y},{t},{v})" for x, y, t, v in _array_expected(2)
            )
        ),
    ),
)
def q81(spark, sf):
    """MVCC version diff, chunk-hash pruned: content addressing means a
    chunk changed iff its index hash changed, so the two version-pinned
    indexes full-outer join on chunk coordinates and unchanged chunks —
    the vast majority at scale — prune WITHOUT decoding; only differing
    chunks are decoded to cells (reader.diff_cells_df).  O(changed
    chunks), not O(cells): the r2 verdict's scale fix for the previous
    explode-both-versions-and-join-cells plan."""
    from . import reader

    conn = _array_fixture(spark)
    tok_a = reader.on_nth_version(conn, 0)
    tok_b = reader.on_nth_version(conn, -1)
    diff = reader.diff_cells_df(conn, tok_a, tok_b, "v")
    return diff.agg(
        F.count("*").alias("n_changed"),
        F.sum(F.col("value_b") - F.col("value_a"))
        .cast("bigint")
        .alias("delta_sum"),
    )


# -- dedup-cluster pipeline + corpus analytics (round 3) ----------------------

# the jaccard-pair CTE chain shared by the cluster oracles: identical to
# _JACCARD_SQL but ending at the thresholded pair set
_PAIR_CTES = """
w AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
      FROM documents),
g AS (SELECT DISTINCT doc_id AS id,
             array_to_string(ws[i+1:i+3], ' ') AS gram
      FROM w, unnest(range(greatest(len(ws)-3, 0)+1)) t(i)
      WHERE len(array_to_string(ws[i+1:i+3], ' ')) > 0),
n AS (SELECT id, count(*) AS ng FROM g GROUP BY id),
p AS (SELECT x.id AS a, y.id AS b, count(*) AS common
      FROM g x JOIN g y ON x.gram = y.gram AND x.id < y.id
      GROUP BY 1, 2),
jac AS (SELECT p.a, p.b
        FROM p JOIN n na ON na.id = p.a JOIN n nb ON nb.id = p.b
        WHERE common * 1.0 / (na.ng + nb.ng - common) >= 0.8),
edges AS (SELECT a, b FROM jac UNION SELECT b AS a, a AS b FROM jac),
reach(id, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT reach.id, e.b FROM edges e JOIN reach ON reach.r = e.a
),
clusters AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
"""


@_q(
    "q82_neardup_clusters",
    "WITH RECURSIVE " + _PAIR_CTES +
    "SELECT id, cluster FROM clusters ORDER BY id",
)
def q82(spark, sf):
    """Connected components of the near-dup pair graph: every paired
    document labeled with the minimum reachable doc id.  Spark side is
    iterative min-label propagation (operators/graph.py — one shuffle
    join + one min-agg per round, diameter-bounded); the oracle is the
    transitive closure as a recursive CTE.

    The declared pair emitter is the EXACT Jaccard inverted index
    (ngram_jaccard_pairs), matching the oracle's pair set with recall 1
    at every sf.  The r3 declared form fed minhash-LSH pairs instead
    (per-pair recall ~0.9998 at 16x4 — not 1), and one near-threshold
    pair missing every band would split a cluster and diverge the whole
    component labeling (ADVICE r03).  minhash stays the at-scale
    emitter (q36; same `pairs` contract — swap one call)."""
    from .functions.dedup import ngram_jaccard_pairs
    from .operators.graph import connected_components

    d = load(spark, sf, "documents")
    # ordered=False: the CC operator re-aggregates the pairs — a
    # global pair sort would be paid and immediately destroyed
    pairs = ngram_jaccard_pairs(d, threshold=0.8, n=3, ordered=False)
    return connected_components(pairs.select("a", "b")).transform(osort, table_rows(sf, "documents"), "id")


@_q(
    "q83_dedup_cluster_keep",
    "WITH RECURSIVE " + _PAIR_CTES + """,
lab AS (SELECT d.doc_id, d.n_chars,
               coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id),
sel AS (SELECT cluster, doc_id,
               first_value(doc_id) OVER (
                   PARTITION BY cluster
                   ORDER BY n_chars DESC, doc_id
               ) AS keep_id
        FROM lab)
SELECT cluster, keep_id, count(*) AS n_docs
FROM sel GROUP BY cluster, keep_id ORDER BY cluster""",
)
def q83(spark, sf):
    """The full near-dup curation pipeline: pair graph → clusters →
    one canonical survivor per cluster (longest text, ties to lowest
    id) — the operation a 100 TB training-data pipeline runs to drop
    duplicate documents while keeping the best copy.  Exact-Jaccard
    pair emitter for the declared form (see q82's recall note);
    minhash-LSH is the drop-in at-scale alternative."""
    from .functions.dedup import ngram_jaccard_pairs
    from .operators.graph import dedup_clusters

    d = load(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.8, n=3, ordered=False)
    return dedup_clusters(d, pairs.select("a", "b"))


@_q(
    "q84_tfidf_top_term",
    """WITH t AS (SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x != '')) AS word
       FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.word,
              tf.tf * ln(nd.n * 1.0 / df.df) AS score
       FROM tf JOIN df USING (word) CROSS JOIN nd),
rk AS (SELECT doc_id, word, score,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, word) AS rn
       FROM sc)
SELECT doc_id, word AS top_term, round(score, 6) AS tfidf
FROM rk WHERE rn = 1 ORDER BY doc_id""",
)
def q84(spark, sf):
    """Highest-TF-IDF term per document (word level).  One exploded
    token pass feeds both tf and df; N and df arrive at the scoring
    join as broadcastable aggregates — the corpus-sized side shuffles
    once on word."""
    d = load_documents_wide(spark, sf)
    t = d.select(
        "doc_id",
        F.explode_outer(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("word"),
    ).where(F.col("word").isNotNull())
    # ONE corpus explode: df is a count-over-window on the (already
    # aggregated, corpus-much-smaller) tf rows — a join of separately
    # derived tf/df/N branches re-runs the explode per branch, because
    # per-branch column pruning specializes each aggregate and defeats
    # ReuseExchange.  N is the plain document count, read with a
    # column-pruned scan of the base table, broadcast as one row.
    tf = t.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_w = Window.partitionBy("word")
    # corpus row count from the parquet FOOTER (table_rows — catalog
    # statistics, zero jobs): the r8 broadcast count subtree cost one
    # full job per action for a single unfiltered-scan scalar (the
    # q94 finding applied here)
    nd = table_rows(sf, "documents")
    sc = (
        tf.withColumn("df", F.count("*").over(df_w))
        .withColumn(
            "score", F.col("tf") * F.log(F.lit(nd) / F.col("df"))
        )
    )
    # argmax per doc as a MIN over struct(-score, word): lexicographic
    # struct ordering gives highest score, ties to the smallest word —
    # an aggregation instead of a rank window, so the per-doc winner is
    # reduced MAP-SIDE and the doc exchange carries one row per doc
    # instead of sorting every (doc, word) score row (the window shape
    # shuffled ~200x more rows at sf0.1)
    best = F.min(
        F.struct(
            (-F.col("score")).alias("ns"),
            F.col("word"),
            F.col("score"),
        )
    ).alias("b")
    return (
        sc.groupBy("doc_id")
        .agg(best)
        .select(
            "doc_id",
            F.col("b.word").alias("top_term"),
            F.round("b.score", 6).alias("tfidf"),
        )
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q85_vocab_df_topk",
    """WITH t AS (SELECT DISTINCT doc_id,
            unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x != '')) AS word
       FROM documents)
SELECT word, count(*) AS df FROM t GROUP BY word
ORDER BY df DESC, word LIMIT 20""",
)
def q85(spark, sf):
    """Vocabulary head: the 20 terms present in the most documents —
    the stop-word discovery scan every corpus-curation run starts
    with."""
    d = load_documents_wide(spark, sf)
    t = d.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            )
        ).alias("word"),
    ).where(F.col("word").isNotNull())
    return (
        t.groupBy("word")
        .agg(F.count("*").alias("df"))
        # orderBy + limit → TakeOrderedAndProject (see q17): the
        # vocabulary is corpus-proportional, so no gather-point sort
        .orderBy(F.col("df").desc(), "word")
        .limit(20)
    )


@_q(
    "q86_event_funnel",
    """WITH f AS (SELECT user_id,
            min(ts) FILTER (event_type = 'view') AS tv,
            min(ts) FILTER (event_type = 'click') AS tc,
            min(ts) FILTER (event_type = 'purchase') AS tp
       FROM events GROUP BY user_id)
SELECT count(*) FILTER (tv IS NOT NULL) AS viewers,
       count(*) FILTER (tv IS NOT NULL AND tc > tv) AS clickers,
       count(*) FILTER (tv IS NOT NULL AND tc > tv AND tp > tc)
           AS purchasers
FROM f""",
)
def q86(spark, sf):
    """Strict-order conversion funnel (first view → later first click
    → later first purchase) — one groupBy(user) with conditional min
    aggregates, one shuffle total."""
    e = load(spark, sf, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
    )
    return f.agg(
        F.count(F.when(F.col("tv").isNotNull(), 1)).alias("viewers"),
        F.count(
            F.when(F.col("tv").isNotNull() & (F.col("tc") > F.col("tv")), 1)
        ).alias("clickers"),
        F.count(
            F.when(
                F.col("tv").isNotNull()
                & (F.col("tc") > F.col("tv"))
                & (F.col("tp") > F.col("tc")),
                1,
            )
        ).alias("purchasers"),
    )


@_q(
    "q87_label_cohesion",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
            FROM embeddings),
u AS (SELECT label, i, emb[i] AS v
      FROM e, unnest(range(1, len(emb) + 1)) t(i)),
m AS (SELECT label, i, avg(v) AS av FROM u GROUP BY 1, 2),
c AS (SELECT label, array_agg(av ORDER BY i) AS cent FROM m GROUP BY 1)
SELECT e.label,
       round(avg(list_cosine_similarity(e.emb, c.cent)), 6) + 0
           AS cohesion,
       count(*) AS n
FROM e JOIN c USING (label) GROUP BY e.label ORDER BY e.label""",
)
def q87(spark, sf):
    """Cluster cohesion: mean-pooled centroid per label (elementwise
    avg via posexplode + groupBy(label, pos) — the scalable mean-pool
    shape) and the average cosine of members to their centroid."""
    e = load(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    u = e.select("label", F.posexplode("emb").alias("i", "v"))
    cent = (
        u.groupBy("label", "i")
        .agg(F.avg("v").alias("av"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "av"))),
                lambda s: s["av"],
            ).alias("cent")
        )
    )
    j = e.join(F.broadcast(cent), "label")
    dot = F.aggregate(
        F.zip_with("emb", "cent", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    j = j.withColumn("_d", dot).withColumn(
        "_cos", F.col("_d") / (norm(F.col("emb")) * norm(F.col("cent")))
    )
    return (
        j.groupBy("label")
        .agg(
            F.round(F.avg("_cos"), 6).alias("cohesion"),
            F.count("*").alias("n"),
        )
        .transform(psort, "label")
    )


@_q(
    "q88_bow_dup_groups",
    """WITH f AS (SELECT doc_id,
            array_to_string(list_sort(list_distinct(
                list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x != ''))), ' ') AS bow
       FROM documents)
SELECT min(doc_id) AS rep, count(*) AS n_docs
FROM f GROUP BY bow HAVING count(*) > 1 ORDER BY rep""",
)
def q88(spark, sf):
    """Bag-of-words duplicate groups: documents identical up to word
    order and multiplicity (normalized-content dedup — catches
    shuffled/re-joined copies exact hashing misses).  One projection
    per doc, one groupBy of the (small) fingerprint."""
    d = load_documents_wide(spark, sf)
    bow = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            )
        ),
        " ",
    )
    return (
        d.select("doc_id", bow.alias("bow"))
        .groupBy("bow")
        .agg(F.min("doc_id").alias("rep"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("rep", "n_docs")
        .transform(osort, table_rows(sf, "documents"), "rep")
    )


@_q(
    "q89_event_transitions",
    """WITH s AS (SELECT user_id, event_type, ts, event_id,
            lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
       FROM events)
SELECT prev, event_type AS next, count(*) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY prev, next ORDER BY prev, next""",
)
def q89(spark, sf):
    """Event-transition matrix (first-order Markov counts) per user
    session stream: one window pass partitioned by user (ties broken
    by event_id for determinism), then a global count of (prev, next)
    pairs."""
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.withColumn("prev", F.lag("event_type").over(w))
    return (
        s.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count("*").alias("n"))
        # bounded output (|event types|^2 transition matrix) → gather
        # sort, not a range-sampled distributed sort
        .transform(psort, "prev", "next")
    )


@_q(
    "q90_resample_ffill",
    """WITH bounds AS (SELECT min(date_trunc('day', ts)) AS d0,
                       max(date_trunc('day', ts)) AS d1 FROM events),
users AS (SELECT DISTINCT user_id FROM events),
grid AS (SELECT u.user_id, t.d
         FROM users u CROSS JOIN bounds b,
              unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) t(d)),
daily AS (SELECT user_id, d, value FROM (
    SELECT user_id, date_trunc('day', ts) AS d, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
ff AS (SELECT g.user_id, g.d,
              last_value(daily.value IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS v
       FROM grid g LEFT JOIN daily USING (user_id, d))
SELECT user_id, d, round(v, 6) + 0 AS v FROM ff ORDER BY user_id, d""",
)
def q90(spark, sf):
    """Time-series resampling with forward fill: every (user, day) grid
    cell carries the user's last observed value at or before that day —
    gap filling for irregular event streams.

    The grid is never JOINED: forward fill means each observed (user,
    day) value covers exactly the days up to the user's next
    observation, so one `lead` window over the per-day aggregate turns
    every daily row into its covered day-range and a sequence explode
    EMITS the filled grid directly (days before a user's first
    observation ride along as a null-valued head range from the global
    lower bound).  That deletes the r5 shape's users×days cross join,
    the distinct-users exchange, and the grid⋈daily shuffle — the plan
    is one (user, day) hash aggregate (map-side combinable, unlike the
    old row_number window, which sorted) plus one user-ranged window,
    both O(observed days), with the output streamed from the explode.
    At 100 TB the grid never materializes as a join input at all."""
    e = load(spark, sf, "events")
    daily = (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.max_by("value", F.struct("ts", "event_id")).alias("v"),
        )
    )
    # The global day bounds come from the parquet FOOTER's ts min/max —
    # catalog statistics, zero Spark jobs (r8 ran a broadcast subtree
    # that re-scanned the whole events table just for min/max: one
    # full extra job per action).  Day truncation of the min/max
    # commutes with min/max of the truncation.  Stats missing → the
    # r8 broadcast-aggregate fallback.
    import datetime as _dt

    mm = table_col_minmax(sf, "events", "ts")
    # type guard (r9 review): a plain-INT64 ts file's footer stats come
    # back as ints — that layout must take the Spark-aggregate fallback
    # below, not crash on .replace().  tz-aware guard (r10): a
    # UTC-adjusted timestamp file's footer datetimes carry tzinfo and
    # truncate to UTC midnights, while the Spark fallback (and the
    # oracle) truncate in the SESSION timezone — off by a day on
    # non-UTC sessions, so that layout also falls back.
    if mm is not None and (
        not isinstance(mm[0], _dt.datetime) or mm[0].tzinfo is not None
    ):
        mm = None
    if mm is not None:
        d0c = F.lit(mm[0].replace(hour=0, minute=0, second=0,
                                  microsecond=0))
        d1c = F.lit(mm[1].replace(hour=0, minute=0, second=0,
                                  microsecond=0))
        bounds = None
    else:
        bounds = e.agg(
            F.min(F.date_trunc("day", "ts")).alias("d0"),
            F.max(F.date_trunc("day", "ts")).alias("d1"),
        )
        d0c, d1c = F.col("d0"), F.col("d1")
    w = Window.partitionBy("user_id").orderBy("d")
    n = spark.sparkContext.defaultParallelism
    day = F.expr("interval 1 day")
    # one ascending day sequence per daily row: the user's FIRST row
    # starts at the global lower bound (its pre-observation days carry
    # null), every row ends just before the next observation (or at
    # the global upper bound) — exploded days < d are the null head
    rng = F.sequence(
        F.when(F.col("_rn") == 1, d0c).otherwise(F.col("d")),
        F.coalesce(F.col("_nxt") - day, d1c),
        day,
    )
    shaped = daily if bounds is None else daily.crossJoin(
        F.broadcast(bounds)
    )
    # Exchange gate (the osort() cost model applied to a window
    # input): at or below the serial cutover the daily rows gather to
    # ONE partition — the window and the presentation order both run
    # there, no range-sampling job (events' footer count bounds
    # |daily| structurally).  Above it: the range exchange on user_id
    # feeds BOTH the lead window and the presentation order (see
    # q14) — the window's (user_id, d) sort is the collect order, the
    # explode is order-preserving, and each row's day range is
    # ascending by construction.  Either way the grid itself is never
    # a join input; it streams out of the explode.
    if table_rows(sf, "events") <= _GATHER_MAX_ROWS:
        shaped = shaped.repartition(1)
    else:
        shaped = shaped.repartitionByRange(n, "user_id")
    return (
        shaped
        .withColumn("_nxt", F.lead("d").over(w))
        .withColumn("_rn", F.row_number().over(w))
        # a null-valued daily row must CARRY the previous observation
        # (the fill ignores nulls) — same window, no extra sort
        .withColumn(
            "_fv",
            F.last("v", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select(
            "user_id",
            F.col("d").alias("_d0"),
            F.round("_fv", 6).alias("_v"),
            F.explode(rng).alias("d"),
        )
        .select(
            "user_id",
            "d",
            F.when(F.col("d") < F.col("_d0"), F.lit(None).cast("double"))
            .otherwise(F.col("_v"))
            .alias("v"),
        )
    )


@_q(
    "q91_star_join",
    "SELECT n_name, year(o_orderdate) AS y, "
    f"CAST(round(sum({REV_SQL}), 2) AS DOUBLE) AS rev, "
    "count(*) AS n "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name, y ORDER BY n_name, y",
)
def q91(spark, sf):
    """Star-schema join (TPC-H Q5 core): the fact table joins three
    dimensions; customer→nation broadcast, lineitem→orders as the one
    big shuffle, pinned by the declared result.

    r13 plan change — PARTIAL AGGREGATION BELOW THE JOIN: every final
    aggregate (sum of extprice*(1-disc), count) distributes over a
    refinement by l_orderkey, and the final group keys (n_name, year)
    are functionally dependent on the ORDERS side alone — so lineitem
    is pre-aggregated by l_orderkey BEFORE the join.  Catalyst has no
    eager-aggregation rule, so the rewrite is declared in the plan.
    The partial agg runs MAP-SIDE before its exchange, cutting the
    shuffled fact rows ~4x (lines per order) and making the big join
    1:1 instead of 1:N; measured at sf1 it took the query from
    1.0 s to ~0.5 s against DuckDB's 0.13 s (BASELINE.md r13).  At
    100 TB the same rewrite cuts the dominant fact shuffle by the
    order-fanout factor regardless of cluster size.  The orders side
    keeps the shuffle_hash hint: SMJ's two sorts are the next data
    term once the fact side shrinks (r8 measured SMJ ahead at sf0.1
    by 0.24 s of tiny-input constants; sf1 reverses it by 25-35%);
    the per-partition hash build on the smaller input is bounded by
    shuffle-partition sizing and AQE still re-plans around it."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    # r14: the partial sums accumulate in exact decimal (see rev_dec) —
    # 4 of the 175 final groups at sf0.01 are exact half-cent rounding
    # ties, so the float version's round(,2) was decided by whatever
    # summation order the plan happened to produce (the r13 rewrite
    # flipped one).  The plan shape is unchanged and stays pinned.
    li_pre = li.groupBy("l_orderkey").agg(
        F.sum(rev_dec()).alias("_rev"),
        F.count("*").alias("_n"),
    )
    return (
        li_pre.join(o.hint("shuffle_hash"), li_pre.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("y"))
        .agg(
            F.round(F.sum("_rev"), 2).cast("double").alias("rev"),
            F.sum("_n").alias("n"),
        )
        # bounded output by construction (|nations| x |years|) → gather
        # sort, not a range-sampled distributed sort
        .transform(psort, "n_name", "y")
    )


@_q(
    "q92_word_entropy",
    """WITH t AS (SELECT doc_id,
            unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x != '')) AS word
       FROM documents),
f AS (SELECT doc_id, word, count(*) AS c FROM t GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total
      FROM f GROUP BY doc_id)
SELECT f.doc_id,
       round(-sum((c * 1.0 / total) * ln(c * 1.0 / total)), 6) + 0
           AS entropy
FROM f JOIN n USING (doc_id) GROUP BY f.doc_id ORDER BY f.doc_id""",
)
def q92(spark, sf):
    """Shannon entropy of each document's word distribution — the
    repetitiveness/quality signal curation pipelines threshold on.
    One explode, one (doc, word) aggregate; the per-doc total is a
    window sum over that aggregate (no second corpus pass, same
    rationale as q84)."""
    d = load_documents_wide(spark, sf)
    t = d.select(
        "doc_id",
        F.explode_outer(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("word"),
    ).where(F.col("word").isNotNull())
    f = t.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    total_w = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(total_w)
    return (
        f.withColumn("_term", p * F.log(p))
        .groupBy("doc_id")
        .agg(F.round(-F.sum("_term"), 6).alias("entropy"))
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q93_boilerplate_prefix_groups",
    """WITH f AS (SELECT doc_id, substr(text, 1, 50) AS pre
       FROM documents)
SELECT min(doc_id) AS rep, count(*) AS n_docs
FROM f GROUP BY pre HAVING count(*) > 1 ORDER BY rep""",
)
def q93(spark, sf):
    """Boilerplate detection: documents sharing their first 50
    characters (headers, templates, crawler artifacts) grouped to a
    representative — one projection + one groupBy of a 50-byte key."""
    d = load(spark, sf, "documents")
    return (
        d.select("doc_id", F.substring("text", 1, 50).alias("pre"))
        .groupBy("pre")
        .agg(F.min("doc_id").alias("rep"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("rep", "n_docs")
        .transform(osort, table_rows(sf, "documents"), "rep")
    )


@_q(
    "q94_rare_token_docs",
    """WITH w AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
           FROM documents),
t AS (SELECT DISTINCT doc_id AS id, unnest(ws) AS word FROM w),
tw AS (SELECT id, word FROM t WHERE word != ''),
rare AS (SELECT word FROM tw GROUP BY word
         HAVING count(*) <= (SELECT count(*) * 0.1 FROM documents))
SELECT id AS doc_id, count(*) AS n_rare
FROM tw WHERE word IN (SELECT word FROM rare)
GROUP BY id ORDER BY doc_id""",
)
def q94(spark, sf):
    """Rare-token screen: documents carrying words whose document
    frequency is ≤ 10% of the corpus — the contamination/canary scan a
    curation pipeline runs (rare tokens are where leaked secrets and
    eval-set canaries live; the relative cutoff keeps the scan
    meaningful at any corpus size, and this fixture's rarest words sit
    at 5%).  ONE corpus explode: df is a count-over-window on the
    word-keyed exchange — the r8 restructure of the former
    aggregate-then-semi-join-back shape, which evaluated the whole
    explode once per branch (the q84 finding: per-branch column
    pruning specializes the subtrees, so ReuseExchange never fires)
    and paid three word exchanges where one suffices.  The rare
    filter still drops hot words right after the window, before the
    per-doc aggregation."""
    d = load_documents_wide(spark, sf)
    tw = (
        d.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(
                    F.filter(F.split("text", r"\s+"), lambda x: x != "")
                )
            ).alias("word"),
        )
        .where(F.col("word").isNotNull())
    )
    # corpus row count from the parquet FOOTER (table_rows — catalog
    # statistics, zero jobs): r8 ran a broadcast count subtree per
    # action just to produce this one unfiltered-scan scalar
    nd = table_rows(sf, "documents")
    return (
        tw.withColumn(
            "df", F.count("*").over(Window.partitionBy("word"))
        )
        .filter(F.col("df") <= F.lit(nd) * 0.1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_rare"))
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q95_source_token_share",
    """WITH s AS (SELECT source,
            CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x != ''))) AS BIGINT) AS words,
            count(*) AS docs
       FROM documents GROUP BY source)
SELECT source, words, docs,
       round(words * 100.0 / sum(words) OVER (), 4) AS pct
FROM s ORDER BY source""",
)
def q95(spark, sf):
    """Per-source token budget: word volume, document count, and each
    source's share of the corpus — the mixture report a training-data
    pipeline checks before sampling.  Share-of-total is a window over
    the tiny aggregate, not a second corpus pass."""
    d = load_documents_wide(spark, sf)
    words = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    s = d.groupBy("source").agg(
        F.sum(words).cast("bigint").alias("words"),
        F.count("*").alias("docs"),
    )
    return (
        s.withColumn(
            "pct",
            F.round(
                F.col("words") * 100.0
                / F.sum("words").over(Window.partitionBy()),
                4,
            ),
        )
        .transform(psort, "source")
    )


@_q(
    "q96_embedding_hygiene",
    """WITH e AS (SELECT label, embedding::DOUBLE[] AS emb
            FROM embeddings),
s AS (SELECT label,
             sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
      FROM e)
SELECT label, count(*) AS n, round(avg(nrm), 6) AS avg_norm,
       round(min(nrm), 6) AS min_norm,
       CAST(count(*) FILTER (nrm = 0) AS BIGINT) AS zeros
FROM s GROUP BY label ORDER BY label""",
)
def q96(spark, sf):
    """Embedding hygiene audit per label: count, norm statistics, and
    zero-vector tally — the sanity scan run before any similarity or
    ANN job (zero vectors break cosine).  Pure JVM column arithmetic."""
    e = load(spark, sf, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("zeros"),
        )
        .transform(psort, "label")
    )


@_q(
    "q97_above_nation_avg",
    """WITH a AS (SELECT c_nationkey, avg(c_acctbal) AS nat_avg
       FROM customer GROUP BY c_nationkey)
SELECT n_name, count(*) AS n_above
FROM customer JOIN a USING (c_nationkey)
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > nat_avg
GROUP BY n_name ORDER BY n_name""",
)
def q97(spark, sf):
    """Correlated-aggregate decorrelation: customers above their own
    nation's average balance — the classic correlated scalar subquery,
    executed as a broadcast join against the per-nation aggregate
    (one customer shuffle, no per-row subquery)."""
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    a = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nat_avg"))
    return (
        c.join(F.broadcast(a), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_above"))
        .transform(psort, "n_name")
    )


# ---------------------------------------------------------------------------
# Round-4 additions: contamination / repetition / quantization /
# sessionization / mixture-sampling operators (q98-q105) — the
# remaining screens of a training-data curation pipeline, each with a
# DuckDB oracle.


@_q(
    "q98_contamination_screen",
    r"""WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x != '') AS ws
       FROM documents),
g AS (SELECT doc_id,
             list_distinct(CASE WHEN len(ws) >= 3
                 THEN list_transform(range(1, len(ws) - 1),
                      i -> array_to_string(ws[i:i+2], ' '))
                 ELSE CAST([] AS VARCHAR[]) END) AS gs
      FROM w),
t AS (SELECT doc_id, unnest(gs) AS gram FROM g),
b AS (SELECT DISTINCT gram, 1 AS hit FROM t WHERE doc_id % 97 = 0),
a AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(COALESCE(hit, 0)) AS BIGINT) AS n_hit
      FROM t LEFT JOIN b USING (gram) GROUP BY t.doc_id)
SELECT g.doc_id, COALESCE(n_grams, 0) AS n_grams,
       COALESCE(n_hit, 0) AS n_hit,
       CASE WHEN COALESCE(n_grams, 0) > 0
            THEN round(n_hit * 100.0 / n_grams, 4) ELSE 0.0 END AS pct
FROM g LEFT JOIN a USING (doc_id)
WHERE g.doc_id % 97 != 0
ORDER BY g.doc_id""",
)
def q98(spark, sf):
    """Benchmark-contamination screen: per-document share of distinct
    word 3-gram shingles that also appear in a held-out benchmark set
    (here the doc_id % 97 == 0 docs) — the eval-leak scan every
    training-data pipeline runs before a model sees the corpus.  The
    benchmark gram set (a fixed eval suite — bounded by construction)
    is folded to ONE set-valued row and broadcast; each corpus doc then
    scores itself with a per-row ``array_intersect``, so the corpus
    side is MAP-ONLY — no explode, no shuffle keyed on gram or doc —
    and scales linearly at 100 TB.  The only exchange in the job is the
    benchmark side's tiny collect_set aggregation."""
    d = load_documents_wide(spark, sf)
    ws = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    grams = F.when(
        F.size("ws") >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 2),
                lambda i: F.array_join(F.slice("ws", i, 3), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", ws.alias("ws")).select(
        "doc_id", grams.alias("gs")
    )
    b = (
        g.where(F.col("doc_id") % 97 == 0)
        # explode_outer + not-null: on sessions without this engine's
        # excluded-rule config, a plain explode lets
        # InferFiltersFromGenerate push size(gs) > 0 below the
        # repartition and re-inline the gram pipeline into the scan
        # (the dedup.shingles idiom)
        .select(F.explode_outer("gs").alias("gram"))
        .where(F.col("gram").isNotNull())
        .agg(F.collect_set("gram").alias("bench"))
    )
    # no row filter on gram emptiness: a size(gs) > 0 predicate gets
    # pushed below the repartition into a single-task scan Filter with
    # the whole gram pipeline inlined (measured 6x at sf0.1 — the trap
    # test_neardup_pipelines_keep_gram_work_off_the_scan pins for the
    # dedup pipelines).  Zero-gram docs are instead REPORTED with
    # pct = 0, and the oracle mirrors that via a doc-level left join.
    return (
        g.where(F.col("doc_id") % 97 != 0)
        .crossJoin(F.broadcast(b))
        .select(
            "doc_id",
            F.size("gs").cast("bigint").alias("n_grams"),
            F.size(F.array_intersect("gs", "bench"))
            .cast("bigint")
            .alias("n_hit"),
        )
        .withColumn(
            "pct",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_hit") * 100.0 / F.col("n_grams"), 4),
            ).otherwise(F.lit(0.0)),
        )
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q99_repetition_screen",
    r"""WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x != '') AS ws
       FROM documents),
t AS (SELECT doc_id, unnest(ws) AS word FROM w),
f AS (SELECT doc_id, word, count(*) AS c FROM t GROUP BY 1, 2),
ww AS (SELECT doc_id, max(c) AS top, CAST(sum(c) AS BIGINT) AS tot
       FROM f GROUP BY doc_id),
g AS (SELECT doc_id,
             CASE WHEN len(ws) >= 2
                 THEN list_transform(range(1, len(ws)),
                      i -> array_to_string(ws[i:i+1], ' '))
                 ELSE CAST([] AS VARCHAR[]) END AS gs
      FROM w),
gg AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS total_g,
              CAST(len(list_distinct(gs)) AS BIGINT) AS distinct_g
       FROM g)
SELECT ww.doc_id,
       round(top * 1.0 / tot, 6) AS top_word_share,
       CASE WHEN total_g > 0
            THEN round(1.0 - distinct_g * 1.0 / total_g, 6)
            ELSE 0.0 END AS dup_bigram_share
FROM ww JOIN gg ON ww.doc_id = gg.doc_id
ORDER BY ww.doc_id""",
)
def q99(spark, sf):
    """Repetition screen (the Gopher/MassiveText quality rules): per
    document, the share of its tokens taken by its single most
    frequent word, and the duplicate-bigram share (1 − distinct/total
    bigrams).  Both signals come from ONE tokenization: the bigram
    stats are per-row array expressions (no explode), and the word
    stats are one (doc, word) aggregate."""
    d = load_documents_wide(spark, sf)
    base = d.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("ws"),
    )
    grams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.array_join(F.slice("ws", i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # The bigram stats are per-ROW array expressions, so they RIDE the
    # word explode as functionally-dependent grouping keys (no extra
    # groups, 16 bytes per exploded row) instead of forming a second
    # branch joined back on doc_id — the former two-branch shape ran
    # the tokenization once per branch and paid a doc_id exchange for
    # the join (r8; same finding as q84/q94).
    withg = base.select(
        "doc_id",
        "ws",
        F.size(grams).cast("bigint").alias("total_g"),
        F.size(F.array_distinct(grams)).cast("bigint").alias("distinct_g"),
    )
    f = (
        # explode_outer + not-null: see q98's note (the plain explode
        # invites size(ws) > 0 inference on foreign sessions)
        withg.select(
            "doc_id",
            "total_g",
            "distinct_g",
            F.explode_outer("ws").alias("word"),
        )
        .where(F.col("word").isNotNull())
        .groupBy("doc_id", "total_g", "distinct_g", "word")
        .agg(F.count("*").alias("c"))
    )
    ww = f.groupBy("doc_id", "total_g", "distinct_g").agg(
        F.max("c").alias("top"), F.sum("c").cast("bigint").alias("tot")
    )
    # no total_g > 0 row filter: it would push below the repartition
    # into a single-task scan Filter with the bigram pipeline inlined
    # (see q98's note); 0/1-word docs report dup_bigram_share = 0 and
    # the oracle's CASE mirrors that
    return (
        ww.select(
            "doc_id",
            F.round(F.col("top") * 1.0 / F.col("tot"), 6).alias(
                "top_word_share"
            ),
            F.when(
                F.col("total_g") > 0,
                F.round(
                    1.0 - F.col("distinct_g") * 1.0 / F.col("total_g"), 6
                ),
            ).otherwise(F.lit(0.0)).alias("dup_bigram_share"),
        )
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q100_embedding_quantize",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings),
s AS (SELECT vec_id, emb, list_min(emb) AS mn, list_max(emb) AS mx
      FROM e),
r AS (SELECT vec_id,
  CASE WHEN mx = mn THEN 0.0 ELSE
    list_max(list_transform(emb, x -> abs(x - (mn +
      round((x - mn) / ((mx - mn) / 255.0)) * ((mx - mn) / 255.0)))))
  END AS max_err,
  CASE WHEN mx = mn THEN 0.0 ELSE
    list_sum(list_transform(emb, x -> (x - (mn +
      round((x - mn) / ((mx - mn) / 255.0)) * ((mx - mn) / 255.0))) ** 2))
      / len(emb)
  END AS mse
FROM s)
SELECT vec_id, round(max_err, 6) AS max_err, round(mse, 9) AS mse
FROM r ORDER BY vec_id""",
)
def q100(spark, sf):
    """Scalar (int8-range) quantization audit: per vector, the max
    absolute and mean squared reconstruction error of min-max
    quantization to 256 levels — the check run before shipping
    quantized embeddings to an ANN index.  Pure JVM array expressions
    (transform/aggregate), one pass, no shuffle at all; at 100 TB this
    is a map-only job."""
    e = load(spark, sf, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    s = ranged(e, "vec_id").select(
        "vec_id",
        emb.alias("emb"),
        F.array_min(emb).alias("mn"),
        F.array_max(emb).alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / 255.0
    deq_err = lambda x: F.abs(  # noqa: E731
        x - (F.col("mn") + F.round((x - F.col("mn")) / scale, 0) * scale)
    )
    max_err = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.array_max(F.transform("emb", deq_err))
    )
    mse = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform("emb", lambda x: F.pow(deq_err(x), 2)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size("emb")
    )
    return (
        s.select(
            "vec_id",
            F.round(max_err, 6).alias("max_err"),
            F.round(mse, 9).alias("mse"),
        )
    )


@_q(
    "q101_token_length_hist",
    r"""WITH t AS (SELECT source,
            unnest(list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x != '')) AS w
       FROM documents)
SELECT source, CAST(least(len(w), 15) AS BIGINT) AS wlen,
       count(*) AS n
FROM t GROUP BY source, wlen ORDER BY source, wlen""",
)
def q101(spark, sf):
    """Token-length histogram per source (capped at 15) — the
    tokenizer-health profile that catches sources full of
    unsegmentable runs.  The histogram is pre-reduced PER DOCUMENT
    with array HOFs (16 fixed buckets), so the explode emits ≤15 rows
    per doc instead of one per word and the aggregate hashes bucket
    rows, not tokens — r9: 0.44s vs the word-explode's 0.55s
    same-window at sf0.1, and strictly less per-row work at any
    corpus scale.  Key space stays |sources| x 15."""
    d = load_documents_wide(spark, sf)
    lens = (
        "transform(filter(split(text, '\\\\s+'), x -> x != ''),"
        " w -> least(length(w), 15))"
    )
    hist = (
        "transform(sequence(1, 15), L -> named_struct("
        "'wlen', CAST(L AS BIGINT),"
        " 'c', size(filter(_lens, x -> x = L))))"
    )
    return (
        d.selectExpr("source", f"{lens} AS _lens")
        .selectExpr("source", f"explode({hist}) AS h")
        .where("h.c > 0")
        .groupBy("source", F.col("h.wlen").alias("wlen"))
        .agg(F.sum("h.c").alias("n"))
        # bounded output (|sources| x 16 length buckets) → gather sort
        .transform(psort, "source", "wlen")
    )


@_q(
    "q102_length_outliers",
    """WITH m AS (SELECT source, median(n_chars) AS med
       FROM documents GROUP BY source),
d2 AS (SELECT d.doc_id, d.source, d.n_chars, m.med
       FROM documents d JOIN m USING (source)),
md AS (SELECT source, median(abs(n_chars - med)) AS mad
       FROM d2 GROUP BY source)
SELECT d2.doc_id, d2.source,
       round((n_chars - med) / (1.4826 * mad), 4) AS rz
FROM d2 JOIN md USING (source)
WHERE mad > 0 AND abs((n_chars - med) / (1.4826 * mad)) > 2
ORDER BY d2.doc_id""",
)
def q102(spark, sf):
    """Robust length-outlier screen: documents whose length sits more
    than 2 robust z-scores (median/MAD) from their source's center —
    the truncation/concatenation-artifact detector.  Both statistics
    are per-source aggregates (exact interpolated median), broadcast
    back against the corpus: two tiny aggregates + one broadcast
    join, corpus touched twice but never shuffled on a wide key."""
    d = load(spark, sf, "documents")
    m = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    d2 = d.join(F.broadcast(m), "source")
    md = d2.groupBy("source").agg(
        F.expr("percentile(abs(n_chars - med), 0.5)").alias("mad")
    )
    rz = (F.col("n_chars") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        d2.join(F.broadcast(md), "source")
        .where((F.col("mad") > 0) & (F.abs(rz) > 2))
        .select("doc_id", "source", F.round(rz, 4).alias("rz"))
        .transform(osort, table_rows(sf, "documents"), "doc_id")
    )


@_q(
    "q103_sessionize_events",
    """WITH e AS (SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('microsecond', lag(ts) OVER w, ts)
                     > 1800000000
             THEN 1 ELSE 0 END AS brk
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e),
g AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
             date_diff('microsecond', min(ts), max(ts)) AS dur_us
      FROM s GROUP BY user_id, sid)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       round(avg(n_events), 4) AS avg_events,
       CAST(max(dur_us) // 1000000 AS BIGINT) AS max_dur_s
FROM g GROUP BY user_id ORDER BY user_id""",
)
def q103(spark, sf):
    """Batch gap-sessionization (30-minute inactivity gap): per user,
    session count, mean session size, and longest session duration —
    the batch twin of the streaming session window (q27).  One
    user-keyed shuffle feeds BOTH windows and the session aggregate
    (same partitioning, Catalyst reuses the exchange); session ids are
    a running sum over gap breaks, the standard islands technique."""
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # micro/milli fixtures surface ts as TIMESTAMP_NTZ; unix_micros
    # needs an instant, and the cast's epoch shift cancels in every
    # use below (gaps and durations are differences)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = F.when(
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    # ONE range exchange on user_id feeds everything (see q14): both
    # windows, both aggregates (clustering satisfied throughout), and
    # the presentation order — the final sort becomes in-partition
    n = spark.sparkContext.defaultParallelism
    s = e.repartitionByRange(n, "user_id").select(
        "user_id", "ts", "event_id", brk.alias("brk")
    ).withColumn(
        "sid",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    g = s.groupBy("user_id", "sid").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.max(us) - F.min(us)).alias("dur_us"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.expr("max(dur_us) div 1000000").cast("bigint").alias(
                "max_dur_s"
            ),
        )
        .sortWithinPartitions("user_id")
    )


@_q(
    "q104_shipping_priority",
    f"""SELECT l_orderkey,
       CAST(round(sum({REV_SQL}), 2) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def q104(spark, sf):
    """TPC-H Q3 core (shipping priority, adapted to the fixture's
    o_orderpriority): top unshipped orders by revenue for one market
    segment.  The segment filter reduces customer to a broadcast
    side; orders x lineitem is the one real shuffle, on the join key
    both sides already aggregate on.  The shuffle_hash hint keeps the
    planner from statistics-broadcasting the filtered orders side
    (its hash-relation build was a third job per action, measured
    0.55s/3j -> 0.49s/2j at sf0.1) — and shuffling on the orderkey is
    the only shape that holds at a scale where orders outgrows any
    broadcast anyway."""
    c = load(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf, "orders").where(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load(spark, sf, "lineitem").where(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # exact-decimal accumulation (see rev_dec): 185 of this query's
        # 12,969 per-order sums at sf0.01 are exact half-cent ties —
        # the float version passed only because none reached the top-10,
        # and its ORDER BY revenue DESC makes rank flips possible too
        .agg(
            F.round(F.sum(rev_dec()), 2).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        # orderBy + limit → TakeOrderedAndProject (see q17); the
        # grouped orders are corpus-proportional
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@_q(
    "q105_token_budget_sample",
    r"""WITH w AS (SELECT doc_id, source,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x != '')) AS BIGINT) AS words
       FROM documents),
r AS (SELECT *, sum(words) OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
      FROM w)
SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(words) AS BIGINT) AS kept_words
FROM r WHERE cum - words < 2000
GROUP BY source ORDER BY source""",
)
def q105(spark, sf):
    """Deterministic token-budget mixture draw: per source, keep
    documents in md5(doc_id) order until a 2,000-word budget is
    reached (greedy; the first over-budget doc is kept so every
    nonempty source contributes).  This is the reproducible sampling
    step that turns the q95 mixture report into an actual training
    mix — hash order makes the draw stable across engines, runs, and
    partitionings.  One source-keyed shuffle for the running sum; the
    aggregate rides the same partitioning."""
    d = load_documents_wide(spark, sf)
    words = (
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
        .cast("bigint")
    )
    w = d.select("doc_id", "source", words.alias("words"))
    win = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = w.withColumn("cum", F.sum("words").over(win))
    return (
        r.where(F.col("cum") - F.col("words") < 2000)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("kept_docs"),
            F.sum("words").cast("bigint").alias("kept_words"),
        )
        .transform(psort, "source")
    )


# -- q106: streaming session windows with driver-visible evidence --------------
# (r12 verdict stretch #8: the streaming operators were pytest-pinned
# only; this runs the REAL streaming path — file source, watermark,
# session_window state store, availableNow trigger — and returns the
# memory sink's content, so the driver's DuckDB oracle check covers a
# Structured Streaming execution end to end.)

_Q106_MEMO: dict = {}


def _replay_workspace(prefix: str) -> str:
    """Session-lifecycle-bounded tempdir for a streaming replay
    (VERDICT r15 #8: the q106-q109 dirs previously lived until
    interpreter ``atexit``, which never runs on SIGKILL and lets a
    long-lived process pile up one dir per stopped session).  Three
    bounds, cheapest first:

    1. **Memo sweep**: every call drops memo entries whose
       SparkSession has been stopped (or garbage-collected) and
       rmtree's their dirs — a process that cycles sessions no longer
       accumulates replay sinks for its whole lifetime.
    2. **Stale-dir pruning**: each dir records its owner pid
       (``owner.pid``); dirs under the same temp root whose owner is
       dead are removed at the next replay in ANY process — the
       SIGKILL/crash leak is collected by the next session instead of
       surviving until a reboot.
    3. **atexit** stays as the in-process backstop for the live dirs.

    Returns the created tempdir path (with ``owner.pid`` stamped)."""
    import atexit as _atexit
    import shutil as _shutil
    import tempfile as _tempfile

    # 1. sweep memo entries owned by stopped/collected sessions
    for k in list(_Q106_MEMO):
        ent = _Q106_MEMO[k]
        sess = ent["spark_ref"]()
        stopped = sess is None
        if not stopped:
            try:
                stopped = sess._jsc.sc().isStopped()
            except Exception:
                stopped = True  # JVM gone == stopped
        if stopped:
            _shutil.rmtree(ent["tmp"], ignore_errors=True)
            del _Q106_MEMO[k]

    # 2. prune same-prefix-family dirs abandoned by dead processes
    troot = _tempfile.gettempdir()
    try:
        names = os.listdir(troot)
    except OSError:
        names = []
    for name in names:
        if not name.startswith("mandoline_q1"):
            continue
        d = os.path.join(troot, name)
        pid_file = os.path.join(d, "owner.pid")
        try:
            with open(pid_file) as f:
                pid = int(f.read().strip())
        except (OSError, ValueError):
            continue  # no/unreadable stamp: not ours to judge, skip
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            _shutil.rmtree(d, ignore_errors=True)
        except OSError:
            continue  # alive but not ours (EPERM) — leave it

    # 3. create this replay's dir, stamped, with the atexit backstop
    tmp = _tempfile.mkdtemp(prefix=prefix)
    with open(os.path.join(tmp, "owner.pid"), "w") as f:
        f.write(str(os.getpid()))
    _atexit.register(_shutil.rmtree, tmp, ignore_errors=True)
    return tmp


def _replay_result(spark, key):
    """Memoized replay sink as a DataFrame, or None on memo miss.  The
    batch read passes the EXPLICIT sink schema captured at replay time:
    a replay whose every row was dropped (e.g. all late data) commits
    zero data files, and a schema-inferring read of that sink raises
    'Unable to infer schema' where the pre-r15 memory sink returned an
    empty table (ADVICE r15) — with the schema it degrades to an empty
    DataFrame of the right shape."""
    ent = _Q106_MEMO.get(key)
    if ent is None:
        return None
    return spark.read.schema(ent["schema"]).parquet(ent["out"])


def _replay_memoize(spark, key, tmp: str, out: str, schema) -> None:
    import weakref

    _Q106_MEMO[key] = {
        "out": out,
        "schema": schema,
        "tmp": tmp,
        "spark_ref": weakref.ref(spark),
    }

# Batch-SQL twin of the watermarked streaming session_window in
# append mode: gap-based islands (>= gap starts a new session —
# windows are [ts, ts+gap)), restricted to sessions the FINAL
# watermark finalized (session end <= max event time - delay; the
# availableNow trigger's closing no-data batch evicts exactly
# those).  Timestamps compare as epoch microseconds so neither
# engine's timestamp formatting is load-bearing.  Shared by q106
# (single data batch) and q107 (event-time-ordered multi-batch) —
# the two replays must produce the SAME finalized sessions.
_STREAM_SESSIONS_ORACLE = """WITH d AS (SELECT user_id, ts, value,
       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 >= INTERVAL 10 MINUTE
            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       THEN 1 ELSE 0 END AS new_s FROM events),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        ROWS UNBOUNDED PRECEDING) AS sid FROM d)
SELECT user_id,
       epoch_us(min(ts)) AS ss_us,
       epoch_us(max(ts) + INTERVAL 10 MINUTE) AS se_us,
       count(*) AS n_events,
       round(sum(value), 3) AS s
FROM s GROUP BY user_id, sid
HAVING max(ts) + INTERVAL 10 MINUTE
       <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
ORDER BY user_id, ss_us"""


@_q("q106_streaming_sessions", _STREAM_SESSIONS_ORACLE)
def q106(spark, sf):
    """Streaming gap sessionization replayed over the events fixture:
    the file-source stream (4 part files, 2 per micro-batch) flows
    through the watermarked ``session_window`` aggregation
    (streaming/ops.py session_counts) under an availableNow trigger in
    append mode; the memory sink holds every session the watermark
    finalized.  Batch-equivalence of exactly this shape is pinned at
    fixture scale in tests/test_streaming.py; here the equivalence is
    driver-checked against the islands-form SQL oracle.  The streaming
    run is memoized per (session, corpus): it is INGEST, not query —
    re-running the returned DataFrame scans the sink (bench counts the
    pipeline cost in build_sec, like the q34/q35 array fixtures)."""
    import os as _os

    from .streaming.ops import (
        read_events_stream,
        run_available_now_to_parquet,
        session_counts,
    )

    key = (id(spark), _os.path.abspath(sf))
    result = _replay_result(spark, key)
    if result is None:
        # the dir holds the replay source AND the parquet sink for the
        # session lifetime (the memo hands the sink path back to every
        # later call); _replay_workspace bounds the lifecycle (memo
        # sweep on session stop + dead-owner pruning + atexit).
        # Parquet sink, not memory sink (r15): the memory table pinned
        # every finalized session in the DRIVER heap for the session
        # lifetime and re-shipped them per scan — see
        # run_available_now_to_parquet's docstring.
        tmp = _replay_workspace("mandoline_q106_")
        src = _os.path.join(tmp, "src")
        # round the fixture's TIMESTAMP(NANOS) through one Spark
        # write so the stream source reads Spark-native micros
        # (same precision the oracle's epoch_us sees)
        load_events(spark, sf).repartition(4).write.parquet(src)
        # ONE data batch (max_files_per_trigger >= file count) +
        # the availableNow trigger's closing no-data batch that
        # finalizes the watermark.  The replayed files are
        # event-time INTERLEAVED (repartition is random), so a
        # multi-batch replay would drop most of a later batch as
        # late data once the first batch's max event time moves
        # the watermark — measured: max_files_per_trigger=1 over
        # 4 files emits 498 of 978 sessions plus 6 spurious
        # partials.  Single-batch processing is the
        # batch-equivalent-by-construction configuration (the
        # cross-micro-batch ORDERED replay semantics are pinned
        # separately in tests/test_streaming.py).
        stream = read_events_stream(
            spark, src, max_files_per_trigger=64
        )
        agg = session_counts(
            stream, gap="10 minutes", watermark="30 minutes"
        )
        out = _os.path.join(tmp, "out")
        run_available_now_to_parquet(
            agg, out, _os.path.join(tmp, "ck")
        )
        _replay_memoize(spark, key, tmp, out, agg.schema)
        result = _replay_result(spark, key)
    return (
        result
        .select(
            "user_id",
            F.unix_micros("session_start").alias("ss_us"),
            F.unix_micros("session_end").alias("se_us"),
            "n_events",
            "s",
        )
        .transform(psort, "user_id", "ss_us")
    )


@_q("q107_streaming_sessions_multibatch", _STREAM_SESSIONS_ORACLE)
def q107(spark, sf):
    """q106's session pipeline replayed as a TRUE multi-micro-batch
    stream (r13 verdict stretch #8): ``maxFilesPerTrigger=1`` over
    four files RANGE-PARTITIONED BY EVENT TIME, so every micro-batch's
    events are >= the previous batch's max event time.  That is the
    configuration under which cross-micro-batch watermark behavior —
    the watermark advancing between batches, finalized session state
    being emitted and EVICTED while later batches still arrive — runs
    under driver-visible oracle evidence instead of pytest-only pins.

    Why ordering is the whole trick: q106 documents (measured) that an
    event-time-INTERLEAVED multi-batch replay drops most of a later
    batch as late data once the first batch's max event time moves the
    watermark (498/978 sessions + 6 spurious partials).  With
    time-ordered files no event is ever below the watermark (min of
    batch k+1 >= max of batch k > watermark_k), so the 1-file-per-
    trigger replay is batch-equivalent BY CONSTRUCTION and must match
    the same islands-form SQL oracle as the single-batch run.  File
    order is forced, not assumed: the file source processes oldest
    modification time first, so each range file's mtime is set to its
    range rank before the stream starts."""
    import os as _os

    from .streaming.ops import (
        read_events_stream,
        run_available_now_to_parquet,
        session_counts,
    )

    key = (id(spark), _os.path.abspath(sf), "multibatch")
    result = _replay_result(spark, key)
    if result is None:
        # parquet sink + lifecycle-bounded dir, q106's rationale
        tmp = _replay_workspace("mandoline_q107_")
        src = _os.path.join(tmp, "src")
        # one range exchange: part-0000i holds the i-th event-time
        # range (contiguous, non-overlapping); the write also
        # rounds the fixture's TIMESTAMP(NANOS) to Spark micros,
        # the precision the oracle's epoch_us compares at
        (
            load_events(spark, sf)
            .repartitionByRange(4, "ts")
            .sortWithinPartitions("ts")
            .write.parquet(src)
        )
        parts = sorted(
            p for p in _os.listdir(src) if p.startswith("part-")
        )
        for i, p in enumerate(parts):
            t = 1_000_000_000 + i  # any strictly increasing mtimes
            _os.utime(_os.path.join(src, p), (t, t))
        stream = read_events_stream(
            spark, src, max_files_per_trigger=1
        )
        agg = session_counts(
            stream, gap="10 minutes", watermark="30 minutes"
        )
        out = _os.path.join(tmp, "out")
        run_available_now_to_parquet(
            agg, out, _os.path.join(tmp, "ck")
        )
        _replay_memoize(spark, key, tmp, out, agg.schema)
        result = _replay_result(spark, key)
    return (
        result
        .select(
            "user_id",
            F.unix_micros("session_start").alias("ss_us"),
            F.unix_micros("session_end").alias("se_us"),
            "n_events",
            "s",
        )
        .transform(psort, "user_id", "ss_us")
    )


# q108's replayed corpus: documents plus a RE-FED duplicate slice
# (every 5th doc again under a shifted id — crawler re-fetches /
# retry storms re-entering the ingest stream).  The gate must admit
# exactly the FIRST writer per content hash, so with the duplicates
# replayed in a strictly later micro-batch the survivors are exactly
# min(doc_id) per md5(text) — the q29 batch-dedup shape, which is why
# that is the oracle.
_STREAM_DEDUP_ORACLE = (
    "WITH src AS (SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 100000 AS doc_id, text FROM documents "
    "WHERE doc_id % 5 = 0) "
    "SELECT min(doc_id) AS doc_id, md5(text) AS h "
    "FROM src GROUP BY md5(text) ORDER BY doc_id"
)


@_q("q108_streaming_dedup_gate", _STREAM_DEDUP_ORACLE)
def q108(spark, sf):
    """Streaming exact-dedup gate under driver-visible oracle evidence
    (VERDICT r14 #4): the documents corpus plus a re-fed duplicate
    slice flows through ``dedup_stream`` (streaming/ops.py:164 —
    md5-keyed ``dropDuplicates`` state, the ingestion-side gate) as a
    TRUE multi-micro-batch availableNow replay, and the admitted rows
    must equal the batch ``min(doc_id) GROUP BY md5(text)`` oracle.

    Determinism is arranged the q107 way — by file mtime order, not
    assumed: the originals are range-split by doc_id into three files
    (no intra-file hash collisions: the corpus is duplicate-free, so
    every original is its hash's sole in-batch member), and the
    duplicate slice is appended as a fourth file with the newest
    mtime.  ``maxFilesPerTrigger=1`` then feeds the originals in
    batches 1-3 and the duplicates in batch 4, so every duplicate
    tests the CROSS-micro-batch state path (hash seen in an earlier
    batch -> row dropped), and first-writer-wins pins the admitted
    doc_id to the original.  Global mode (no watermark): state is the
    distinct-content set, the q29 semantics; the watermark-bounded
    variant is pinned in tests/test_streaming.py."""
    import os as _os

    from .streaming.ops import dedup_stream, run_available_now_to_parquet

    key = (id(spark), _os.path.abspath(sf), "dedup_gate")
    result = _replay_result(spark, key)
    if result is None:
        # parquet sink + lifecycle-bounded dir, q106's rationale — for
        # THIS replay the memory sink was the worst of the four: the
        # admitted rows carry the full document text
        tmp = _replay_workspace("mandoline_q108_")
        src = _os.path.join(tmp, "src")
        docs = load(spark, sf, "documents").select("doc_id", "text")
        (
            docs.repartitionByRange(3, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.parquet(src)
        )
        firsts = sorted(
            p for p in _os.listdir(src) if p.startswith("part-")
        )
        (
            docs.filter(F.col("doc_id") % 5 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(100000))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for i, p in enumerate(firsts):
            t = 1_000_000_000 + i
            _os.utime(_os.path.join(src, p), (t, t))
        for p in _os.listdir(src):
            if p.startswith("part-") and p not in firsts:
                t = 1_000_000_000 + 100
                _os.utime(_os.path.join(src, p), (t, t))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        admitted = dedup_stream(
            stream, content_col="text", id_col="doc_id"
        )
        out = _os.path.join(tmp, "out")
        run_available_now_to_parquet(
            admitted, out, _os.path.join(tmp, "ck")
        )
        _replay_memoize(spark, key, tmp, out, admitted.schema)
        result = _replay_result(spark, key)
    return (
        result
        .select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("h"),
        )
        .transform(psort, "doc_id")
    )


_STREAM_IJOIN_ORACLE = (
    "SELECT l.event_id AS l_id, r.event_id AS r_id, "
    "l.user_id AS user_id, epoch_us(l.ts) AS l_us, epoch_us(r.ts) AS r_us "
    "FROM events l JOIN events r ON l.user_id = r.user_id "
    "AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 60 MINUTE "
    "WHERE l.event_type = 'click' AND r.event_type = 'view' "
    "ORDER BY l_id, r_id"
)


@_q("q109_streaming_interval_join", _STREAM_IJOIN_ORACLE)
def q109(spark, sf):
    """Stream-stream interval join under driver-visible oracle evidence
    (VERDICT r14 #4): clicks join the views that preceded them within
    60 minutes per user (``interval_join_streams``,
    streaming/ops.py:107), replayed as a TRUE multi-micro-batch
    availableNow stream on BOTH sides and compared to the identical
    batch join.

    The replay reuses q107's event-time-ordered file layout: one range
    exchange writes four contiguous time-range files with forced
    mtimes, and both sides read the same directory at
    ``maxFilesPerTrigger=1``, so the two sources advance through the
    same four micro-batches in event-time order.  Cross-batch buffering
    is genuinely exercised — a click early in batch k+1 must find view
    rows buffered from batch k — while ordered replay keeps the join
    lossless BY CONSTRUCTION: the watermark after batch k is
    maxts_k - 90min, right-side state is evicted only below
    watermark - lookback = maxts_k - 150min, and no later click needs a
    view older than maxts_k - 60min.  The two-sided event-time bound is
    what makes the state finite at all (without it a stream-stream
    join buffers forever); its batch-equivalence at fixture scale is
    also pytest-pinned (tests/test_streaming.py)."""
    import os as _os

    from .streaming.ops import (
        interval_join_streams,
        read_events_stream,
        run_available_now_to_parquet,
    )

    key = (id(spark), _os.path.abspath(sf), "interval_join")
    result = _replay_result(spark, key)
    if result is None:
        # parquet sink + lifecycle-bounded dir, q106's rationale
        tmp = _replay_workspace("mandoline_q109_")
        src = _os.path.join(tmp, "src")
        (
            load_events(spark, sf)
            .repartitionByRange(4, "ts")
            .sortWithinPartitions("ts")
            .write.parquet(src)
        )
        parts = sorted(
            p for p in _os.listdir(src) if p.startswith("part-")
        )
        for i, p in enumerate(parts):
            t = 1_000_000_000 + i
            _os.utime(_os.path.join(src, p), (t, t))
        left = read_events_stream(
            spark, src, max_files_per_trigger=1
        ).filter(F.col("event_type") == "click")
        right = read_events_stream(
            spark, src, max_files_per_trigger=1
        ).filter(F.col("event_type") == "view")
        joined = interval_join_streams(
            left,
            right,
            on="user_id",
            lookback="60 minutes",
            watermark="90 minutes",
        )
        out = _os.path.join(tmp, "out")
        run_available_now_to_parquet(
            joined, out, _os.path.join(tmp, "ck")
        )
        _replay_memoize(spark, key, tmp, out, joined.schema)
        result = _replay_result(spark, key)
    return (
        result
        .select(
            F.col("event_id").alias("l_id"),
            F.col("r_event_id").alias("r_id"),
            "user_id",
            F.unix_micros("ts").alias("l_us"),
            F.unix_micros("r_ts").alias("r_us"),
        )
        .transform(psort, "l_id", "r_id")
    )
