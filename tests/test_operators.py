"""Composite operators (as-of join, range join, grouped top-k) vs
brute-force oracles, and the plan-inspection helpers that pin the
scale-critical plan properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mandoline_spark.operators import asof_join, range_join, topk_per_group
from mandoline_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = np.random.default_rng(5)
    trades = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], 200),
            "t": np.sort(rng.integers(0, 1000, 200)),
            "qty": rng.integers(1, 100, 200),
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], 300),
            # unique timestamps: tie order among duplicate right keys is
            # arbitrary in pandas (depends on its unstable sort), so it
            # is not a semantic to pin; left-side duplicates stay tested
            "t": np.sort(rng.choice(np.arange(2000), 300, replace=False)),
            "px": np.round(rng.uniform(10, 20, 300), 2),
        }
    )
    return spark.createDataFrame(trades), spark.createDataFrame(quotes), trades, quotes


def test_asof_join_matches_pandas(trades_quotes):
    tdf, qdf, trades, quotes = trades_quotes
    got = (
        asof_join(tdf, qdf, on="t", by="sym")
        .orderBy("sym", "t", "qty")
        .toPandas()
    )
    oracle = pd.merge_asof(
        trades.sort_values("t"),
        quotes.sort_values("t"),
        on="t",
        by="sym",
        suffixes=("", "_r"),
    ).rename(columns={"px": "px_r"}).sort_values(["sym", "t", "qty"]).reset_index(drop=True)
    got = got[oracle.columns]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), oracle, check_dtype=False
    )


def test_asof_join_tolerance(trades_quotes):
    tdf, qdf, trades, quotes = trades_quotes
    got = (
        asof_join(tdf, qdf, on="t", by="sym", tolerance=10)
        .orderBy("sym", "t", "qty")
        .toPandas()
    )
    oracle = pd.merge_asof(
        trades.sort_values("t"),
        quotes.sort_values("t"),
        on="t",
        by="sym",
        tolerance=10,
        suffixes=("", "_r"),
    ).rename(columns={"px": "px_r"}).sort_values(["sym", "t", "qty"]).reset_index(drop=True)
    got = got[oracle.columns]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), oracle, check_dtype=False
    )


def test_asof_join_tie_col_matches_preagg(spark):
    """``tie_col`` (r15, the q45 rewrite) must select, among duplicate
    right keys, exactly the row the old ``groupBy(by, on).agg(max(v))``
    pre-reduction produced — same matched value for every left row,
    with the pre-aggregation's hash exchange gone from the plan.
    Duplicate (sym, t) right rows are the whole point here, so the
    fixture forces heavy key collisions."""
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B"], 120),
            "t": np.sort(rng.integers(0, 60, 120)),
            "lid": range(120),
        }
    )
    right = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B"], 400),
            # ~7 duplicates per (sym, t) on average
            "t": rng.integers(0, 60, 400),
            "v": rng.integers(0, 10_000, 400),
        }
    )
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    got = (
        asof_join(ldf, rdf, on="t", by="sym", tie_col="v")
        .orderBy("sym", "t", "lid")
        .toPandas()
    )
    preagg = rdf.groupBy("sym", "t").agg(F.max("v").alias("v"))
    want = (
        asof_join(ldf, preagg, on="t", by="sym")
        .orderBy("sym", "t", "lid")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )
    # the structural claim: tie_col's plan carries no aggregation
    from mandoline_spark.plans.inspect import explain_str

    plan = explain_str(asof_join(ldf, rdf, on="t", by="sym", tie_col="v"))
    assert "HashAggregate" not in plan


def test_range_join_matches_naive(spark):
    rng = np.random.default_rng(6)
    pts = pd.DataFrame({"pid": range(300), "x": rng.uniform(0, 100, 300)})
    starts = rng.uniform(0, 95, 40)
    ivs = pd.DataFrame(
        {
            "iid": range(40),
            "lo": starts,
            "hi": starts + rng.uniform(0.5, 10, 40),
        }
    )
    pdf, idf = spark.createDataFrame(pts), spark.createDataFrame(ivs)
    got = (
        range_join(pdf, idf, "x", "lo", "hi", bucket_width=5.0)
        .select("pid", "iid")
        .orderBy("pid", "iid")
        .toPandas()
    )
    naive = pts.merge(ivs, how="cross")
    naive = naive[(naive.lo <= naive.x) & (naive.x < naive.hi)][
        ["pid", "iid"]
    ].sort_values(["pid", "iid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), naive, check_dtype=False)


def test_topk_per_group(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 100),
            "v": rng.integers(0, 1000, 100),
            "id": range(100),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 5)
        .orderBy("g", F.col("v").desc(), "id")
        .toPandas()
    )
    oracle = (
        pdf.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g")
        .head(5)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), oracle, check_dtype=False)


# -- plan inspection ----------------------------------------------------------

def test_pushdown_and_pruning_visible(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_partkey").between(100, 199)).select(
        "l_orderkey", "l_partkey"
    )
    pf = pushed_filters(q)
    assert any("l_partkey" in f and "GreaterThan" in f for f in pf), pf
    assert set(scan_read_schema(q)) == {"l_orderkey", "l_partkey"}
    assert wholestage_codegen_ids(q)


def test_broadcast_join_detected(spark):
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert has_broadcast_join(j)


def test_salted_join_matches_plain_join(spark):
    from mandoline_spark.operators import salted_join

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    pt = (
        spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .select("p_partkey", "p_name")
        .withColumnRenamed("p_partkey", "l_partkey")
    )
    a = (
        salted_join(li, pt, "l_partkey")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("s"))
        .first()
    )
    b = (
        li.join(pt, "l_partkey")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("s"))
        .first()
    )
    assert (a["c"], float(a["s"])) == (b["c"], float(b["s"]))


# -- connected components (operators/graph.py) --------------------------------


def test_connected_components_chain_and_islands(spark):
    """A 4-node chain (worst-case diameter), a triangle, and a 2-clique
    all label to their minimum member."""
    from mandoline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {
        (r.id, r.cluster) for r in connected_components(edges).collect()
    }
    assert got == (
        {(i, 1) for i in (1, 2, 3, 4)}
        | {(i, 10) for i in (10, 11, 12)}
        | {(i, 20) for i in (20, 21)}
    )


def test_dedup_clusters_keep_longest(spark):
    from mandoline_spark.operators.graph import dedup_clusters

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = [
        (r.cluster, r.keep_id, r.n_docs)
        for r in dedup_clusters(docs, pairs).collect()
    ]
    # cluster 1 = {1,2,3}: longest are 2 and 3 (30 chars), tie -> id 2;
    # doc 4 is a singleton cluster of itself
    assert got == [(1, 2, 3), (4, 4, 1)]


def test_connected_components_long_chain_converges_or_raises(spark):
    """A 30-node chain needs ~29 propagation rounds: with enough
    iterations the labels are exact; with too few the operator must
    FAIL rather than silently return half-propagated labels."""
    import pytest

    from mandoline_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "a long, b long"
    )
    got = {
        (r.id, r.cluster)
        for r in connected_components(chain, max_iter=40).collect()
    }
    assert got == {(i, 1) for i in range(1, 31)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """The cluster deployment path (r3 verdict item 3): with
    ``checkpoint_dir`` set, per-round lineage truncation uses reliable
    ``df.checkpoint()`` files (executor-loss tolerant) instead of
    unreplicated executor-local blocks.  Asserts the reliable path was
    actually exercised (checkpoint files exist under the dir) and the
    labels equal the localCheckpoint default's."""
    from mandoline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)],
        "a long, b long",
    )
    ckdir = str(tmp_path / "cc_ckpt")
    got = {
        (r.id, r.cluster)
        for r in connected_components(edges, checkpoint_dir=ckdir).collect()
    }
    want = {
        (r.id, r.cluster) for r in connected_components(edges).collect()
    }
    assert got == want
    import os

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert files, "no reliable checkpoint files were written"


def test_connected_components_frees_prior_round_blocks(spark):
    """At most two label snapshots live in block storage during the
    loop, and after it only the returned snapshot (+ any pre-existing
    persists) remains — the ADVICE r03 accumulation fix."""
    from mandoline_spark.operators.graph import connected_components

    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "a long, b long"
    )
    labels = connected_components(chain, max_iter=20)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before
    # ~11 rounds ran; without eager freeing each would leave a snapshot
    assert len(after) <= 2, f"leaked {len(after)} persisted RDDs"
    assert labels.count() == 12  # the survivor is still readable


def test_connected_components_concurrent_persist_survives(spark):
    """A concurrent thread persisting unrelated DataFrames while
    connected_components iterates must keep its caches: the per-round
    block freeing unpersists each checkpoint via its OWN RDD handle
    (r4's global persistent-RDD-set diff could capture and free an
    interleaved persist)."""
    import threading

    from pyspark import StorageLevel

    from mandoline_spark.operators.graph import connected_components

    stop = threading.Event()
    kept: list = []
    errs: list = []

    def churn():
        i = 0
        try:
            while not stop.is_set():
                df = spark.range(1000 + i).selectExpr("id", "id * 2 AS y")
                df.persist(StorageLevel.MEMORY_ONLY)
                df.count()
                kept.append(df)
                i += 1
        except Exception as e:  # surface thread failures in the assert
            errs.append(e)

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    try:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 12)], "a long, b long"
        )
        got = {
            (r.id, r.cluster) for r in connected_components(edges).collect()
        }
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errs, errs
    assert got == {(i, 1) for i in range(1, 13)}
    # every concurrently-persisted DataFrame still has live storage:
    # its RDD must still be in the session's persistent-RDD registry
    # (an RDD-level unpersist — what the old diff-based freeing did —
    # removes it there while df.storageLevel still reports MEMORY_ONLY)
    assert kept
    live = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert live >= len(kept), f"{live} persistent RDDs < {len(kept)} persists"
    for df in kept:
        assert df.storageLevel.useMemory, "concurrent persist was freed"
        df.unpersist()


def test_text_metrics_null_vs_empty(spark):
    """NULL text must yield NULL ratios (a missing doc is not a clean
    doc — ADVICE r4); empty string still scores 0.0."""
    from pyspark.sql import functions as F

    from mandoline_spark.functions.text import punct_ratio, stopword_ratio

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the cat!!")], "id long, text string"
    )
    rows = {
        r.id: (r.p, r.s)
        for r in df.select(
            "id",
            punct_ratio(F.col("text")).alias("p"),
            stopword_ratio(F.col("text")).alias("s"),
        ).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2] == (0.0, 0.0)
    assert rows[3][0] > 0 and rows[3][1] == 0.5


def test_connected_components_manages_aqe(spark):
    """r15 (VERDICT r14 #6): the engine owns the measured AQE
    recommendation — on an AQE-on session the iteration runs with
    adaptive execution disabled (no per-round re-plan cycle), the
    session conf is RESTORED afterwards (including on the
    non-convergence raise path), results are unchanged, and
    ``manage_aqe=False`` leaves the conf untouched throughout."""
    import pytest

    from mandoline_spark.operators.graph import connected_components

    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    expect = {(i, 1) for i in (1, 2, 3, 4)} | {(10, 10), (11, 10)}

    seen_inside: list[str] = []
    # observe the conf mid-iteration via the checkpoint hook: wrap
    # localCheckpoint on the DataFrame class is invasive; instead use a
    # 1-hop graph where the FIRST round converges and read the conf
    # right after (the finally must already have restored it), plus a
    # deep chain that raises — both paths restore.
    try:
        spark.conf.set(key, "true")
        got = {
            (r.id, r.cluster)
            for r in connected_components(edges).collect()
        }
        assert got == expect
        assert spark.conf.get(key) == "true", "conf not restored"
        # raise path: a 12-node chain cannot converge in 2 hops
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "a long, b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iter=2)
        assert spark.conf.get(key) == "true", "raise path leaked conf"
        # opt-out regime: conf is never touched, so mid-run state is
        # whatever the session says; just assert correctness + no flip
        got2 = {
            (r.id, r.cluster)
            for r in connected_components(
                edges, manage_aqe=False
            ).collect()
        }
        assert got2 == expect
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, old)


def test_connected_components_hops_per_job_variants(spark):
    """r16 (VERDICT r15 #5): the hop-composition depth is a pure
    job-count/plan-size trade — every ``hops_per_job`` must yield the
    identical labeling, and ``max_iter`` keeps counting SINGLE hops
    regardless of composition."""
    from mandoline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)]
        + [(20, 21), (21, 22), (20, 22), (30, 31)],
        "a long, b long",
    )
    ref = sorted(
        (r.id, r.cluster)
        for r in connected_components(edges, hops_per_job=2).collect()
    )
    for k in (1, 3, 4):
        got = sorted(
            (r.id, r.cluster)
            for r in connected_components(edges, hops_per_job=k).collect()
        )
        assert got == ref, k
    # max_iter counts hops, not jobs: a diameter-9 chain needs ~10
    # hops to settle its convergence signal; max_iter=4 must raise
    # even when one composed job covers 4 hops
    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a long, b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=4, hops_per_job=4)
