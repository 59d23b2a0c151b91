"""Unit tests for the dedup operators against brute-force Python
oracles — locks in the posting-list pair refactor (ADVICE r01): the
incremental emitter, the max_df recount path, the simhash banding, and
the shingle-less-doc exclusion all get content-level checks here
(q38's driver check is rows-only).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row, functions as F

from mandoline_spark.functions.dedup import (
    _posting_pairs,
    doc_grams,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _py_grams(text: str, n: int = 3) -> set[str]:
    """Python mirror of gram_array: word n-grams (partial tail gram for
    short texts), distinct, only fully-empty grams dropped.  Mirrors
    concat_ws EXACTLY: empty split tokens are KEPT (a doc with leading
    whitespace splits to ['', ...] and its grams carry the empty word,
    e.g. ' a b'), only past-the-end words (NULL, skipped by concat_ws)
    are absent — dropping empties here diverged from gram_array for any
    leading/trailing-whitespace doc (ADVICE r02)."""
    import re

    words = re.split(r"\s+", text)
    out = set()
    for i in range(max(len(words) - n, 0) + 1):
        g = " ".join(words[i : i + n])
        if g:
            out.add(g)
    return out


# -- posting-pair emitter -----------------------------------------------------


def test_posting_pairs_enumerate_upper_triangle(spark):
    rows = [Row(id=i, bucket=b) for b, n in [(0, 4), (1, 2), (2, 1)] for i in range(n)]
    # bucket 0 holds ids 0..3, bucket 1 ids 0..1, bucket 2 id 0
    banded = spark.createDataFrame(rows)
    got = {
        (r.a, r.b)
        for r in _posting_pairs(banded, ["bucket"], []).collect()
    }
    want = set(itertools.combinations(range(4), 2)) | {(0, 1)}
    assert got == want


def test_posting_pairs_payload_and_max_bucket(spark):
    rows = [
        Row(id=i, bucket=b, v=i * 10)
        for b, ids in [(0, [1, 2, 3]), (1, [4, 5])]
        for i in ids
    ]
    banded = spark.createDataFrame(rows)
    got = sorted(
        (r.a, r.b, r.v_a, r.v_b)
        for r in _posting_pairs(banded, ["bucket"], ["v"], max_bucket=2).collect()
    )
    # bucket 0 (size 3) dropped by the cap; bucket 1 survives
    assert got == [(4, 5, 40, 50)]


# -- pure-python xxh64 mirror --------------------------------------------------


def test_py_xxh64_matches_spark(spark):
    """The oracle-side XXH64 (functions/_xxh64.py, used to generate
    q38's literal-VALUES expectation) must match F.xxhash64 byte-for-
    byte across stripe/tail lengths and multi-byte UTF-8."""
    import random
    import string

    from pyspark.sql import Row

    from mandoline_spark.functions._xxh64 import xxh64_signed

    random.seed(7)
    alphabet = string.ascii_letters + " äöü€𝄞"
    samples = [""] + [
        "".join(random.choice(alphabet) for _ in range(n))
        for n in list(range(1, 40)) + [63, 64, 65, 95, 96, 97]
    ]
    rows = (
        spark.createDataFrame([Row(s=s) for s in samples])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxh64_signed(r.s.encode("utf-8")) == r.h, repr(r.s)


# -- Arrow kernels vs expression folds ----------------------------------------


def test_signature_kernels_match_expression_folds(spark):
    """The Arrow-batched numpy folds (_minhash_kernel/_simhash_kernel,
    the hot path) must be bit-for-bit the JVM expression folds
    (_signature_col/_simhash_col, kept as the executable spec) —
    including NULL gram arrays (NULL out) and empty arrays (all-PRIME /
    zero degenerate values)."""
    from mandoline_spark.functions.dedup import (
        _hashed_grams,
        _minhash_kernel,
        _signature_col,
        _simhash_col,
        _simhash_kernel,
        gram_array,
    )

    docs = _docs(spark).select(
        F.col("doc_id").alias("id"),
        F.split("text", r"\s+").alias("_w"),
    )
    edge = spark.createDataFrame(
        [Row(id=-1, _w=[]), Row(id=-2, _w=None)], docs.schema
    )
    dg = docs.union(edge).select("id", gram_array("_w", 3).alias("grams"))
    both = dg.select(
        "id",
        _signature_col(F.col("grams"), 16, 42).alias("sig_e"),
        _minhash_kernel(16, 42)(_hashed_grams("grams")).alias("sig_k"),
        _simhash_col(F.col("grams")).alias("sh_e"),
        _simhash_kernel(64)(_hashed_grams("grams")).alias("sh_k"),
    ).collect()
    assert both  # fixture non-empty
    for r in both:
        assert r.sig_e == r.sig_k, r.id
        assert r.sh_e == r.sh_k, r.id


# -- simhash -------------------------------------------------------------------


def _brute_simhash_pairs(spark, docs, max_hamming: int, n: int = 3):
    """All a<b pairs with hamming(simhash) <= max_hamming, by full scan
    over the per-doc fingerprints (shingle-less docs excluded, matching
    simhash_pairs)."""
    dg = doc_grams(docs, n=n).where(F.size("grams") > 0)
    sigs = {
        r.id: r.simhash
        for r in dg.join(simhash(docs, n=n), "id").select("id", "simhash").collect()
    }
    ids = sorted(sigs)

    def ham(a, b):
        # mask: fingerprints are int64 (possibly negative); Python's
        # bin() on a negative xor would count magnitude bits instead of
        # two's-complement bits
        return bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")

    return {
        (a, b, ham(a, b))
        for a, b in itertools.combinations(ids, 2)
        if ham(a, b) <= max_hamming
    }


def test_simhash_pairs_exact_within_pigeonhole(spark):
    """With max_hamming <= bands-1 the banding is exact: output must
    EQUAL the brute-force hamming scan."""
    docs = _docs(spark)
    got = {
        (r.a, r.b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=3, bands=4).collect()
    }
    assert got == _brute_simhash_pairs(spark, docs, max_hamming=3)


def test_simhash_pairs_sound_beyond_pigeonhole(spark):
    """At max_hamming=8 with 4 bands the banding is a recall<1
    heuristic, but every emitted pair must be a true hamming<=8 pair
    and every hamming<=3 pair must still be found (pigeonhole)."""
    docs = _docs(spark)
    got = {
        (r.a, r.b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=8, bands=4).collect()
    }
    brute8 = _brute_simhash_pairs(spark, docs, max_hamming=8)
    brute3 = {t for t in brute8 if t[2] <= 3}
    assert got <= brute8
    assert brute3 <= got


# -- ngram jaccard -------------------------------------------------------------


def _brute_jaccard_pairs(texts: dict, threshold: float, max_df=None):
    grams = {i: _py_grams(t) for i, t in texts.items()}
    if max_df is not None:
        df_count = {}
        for gs in grams.values():
            for g in gs:
                df_count[g] = df_count.get(g, 0) + 1
        grams = {
            i: {g for g in gs if df_count[g] <= max_df}
            for i, gs in grams.items()
        }
    out = set()
    for a, b in itertools.combinations(sorted(grams), 2):
        ga, gb = grams[a], grams[b]
        common = len(ga & gb)
        if common == 0:
            continue
        jac = common / (len(ga) + len(gb) - common)
        if jac >= threshold:
            out.add((a, b, round(jac, 6)))
    return out


@pytest.mark.parametrize("max_df", [None, 3])
def test_ngram_jaccard_matches_bruteforce(spark, max_df):
    docs = _docs(spark).limit(120)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = {
        (r.a, r.b): float(r.jac)
        for r in ngram_jaccard_pairs(
            docs, threshold=0.2, max_df=max_df
        ).collect()
    }
    brute = {(a, b): j for a, b, j in _brute_jaccard_pairs(texts, 0.2, max_df)}
    assert set(got) == set(brute)
    for pair, j in got.items():
        assert j == pytest.approx(brute[pair], abs=1e-6)


# -- shingle-less docs ----------------------------------------------------------


def test_empty_docs_never_pair(spark):
    # NB: two whitespace-only docs would legitimately pair (both carry
    # the single gram " ", same as the DuckDB array_to_string oracle),
    # so only one appears here; truly empty text yields no shingles
    rows = [
        Row(doc_id=1, text=""),
        Row(doc_id=2, text="   "),
        Row(doc_id=3, text="unrelated words entirely different here"),
        Row(doc_id=4, text="alpha beta gamma delta"),
        Row(doc_id=5, text="alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows)
    mh = minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert [(r.a, r.b) for r in mh] == [(4, 5)]
    sh = simhash_pairs(docs, max_hamming=3).collect()
    assert [(r.a, r.b) for r in sh] == [(4, 5)]


def test_minhash_verify_broadcast_id_named_id(spark):
    """The verify_broadcast probe joins the raw corpus to the
    candidate rows; with id_col == "id" the bare column name exists on
    BOTH sides (r9 review finding — the qualified join/select must
    resolve it, as the r8 USING join did)."""
    rows = [
        # identical texts: banding recall is 1.0 regardless of seed —
        # this test pins name RESOLUTION, not LSH recall
        Row(id=1, text="alpha beta gamma delta epsilon zeta"),
        Row(id=2, text="alpha beta gamma delta epsilon zeta"),
        Row(id=3, text="totally different words over here now"),
    ]
    docs = spark.createDataFrame(rows)
    got = minhash_lsh_pairs(
        docs, threshold=0.5, id_col="id", verify_broadcast=True
    ).collect()
    assert [(r.a, r.b, r.jac) for r in got] == [(1, 2, 1.0)]


def test_ngram_jaccard_string_ids(spark):
    """The fused max_df path's size marker is the SELF-PAIR (x, x), so
    it must carry whatever type the id column has — pin the non-long
    case with string ids against the brute-force oracle."""
    texts = {
        "doc-a": "the quick brown fox jumps over the lazy dog",
        "doc-b": "the quick brown fox jumps over the lazy cat",
        "doc-c": "completely different words here entirely now",
        "doc-d": "the quick brown fox jumps over the lazy dog",
    }
    docs = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    got = {
        (r.a, r.b, r.jac)
        for r in ngram_jaccard_pairs(
            docs, threshold=0.3, max_df=10
        ).collect()
    }
    want = _brute_jaccard_pairs(texts, 0.3, max_df=10)
    assert got == want, (got, want)


def test_ngram_jaccard_size_band_prune_exact(spark):
    """r16 fused broadcast shape: the pair emitter drops pairs whose
    post-drop set sizes make the threshold unreachable
    (jac <= min/max), BEFORE the pair exchange.  Pins: (a) a pair the
    band provably excludes (|A|=10 vs |B|=40, jac <= 0.25 < 0.5) never
    changes the result; (b) a pair sitting EXACTLY on the boundary
    (A subset of B, |A|=10, |B|=20, jac = 10/20 = 0.5 = t) is kept —
    the -1 integer slack in the prune inequality protects it; (c) the
    broadcast shape equals the shuffle-join shape and the brute-force
    oracle on the same fixture."""
    toks = [f"w{i}" for i in range(60)]

    def text(idx):  # distinct 3-gram per consecutive token triple
        return " ".join(toks[i] for i in idx)

    rows = [
        # A: 12 tokens -> 10 grams; B: A's tokens + 30 more -> 40 grams
        Row(doc_id=1, text=text(range(12))),
        Row(doc_id=2, text=text(range(42))),
        # C == A exactly (jac 1.0, kept)
        Row(doc_id=3, text=text(range(12))),
        # D: first 22 tokens -> 20 grams; A's grams are a subset:
        # jac(A, D) = 10 / (10 + 20 - 10) = 0.5 == threshold exactly
        Row(doc_id=4, text=text(range(22))),
    ]
    docs = spark.createDataFrame(rows)
    texts = {r.doc_id: r.text for r in rows}
    want = _brute_jaccard_pairs(texts, 0.5, max_df=50)
    got_b = {
        (r.a, r.b, float(r.jac))
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, max_df=50, sizes_broadcast=True
        ).collect()
    }
    got_s = {
        (r.a, r.b, float(r.jac))
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, max_df=50, sizes_broadcast=False
        ).collect()
    }
    assert got_b == got_s
    assert {(a, b) for a, b, _ in got_b} == {(a, b) for a, b, _ in want}
    brute = {(a, b): j for a, b, j in want}
    for a, b, j in got_b:
        assert j == pytest.approx(brute[(a, b)], abs=1e-6)
    # the boundary pair and the exact-dup pair are present, the banded
    # pair is not
    keys = {(a, b) for a, b, _ in got_b}
    assert (1, 4) in keys and (1, 3) in keys
    assert (1, 2) not in keys and (2, 3) not in keys


def test_minhash_verify_broadcast_streams_one_gram_pass(spark):
    """r16: the broadcast verify streams the ONE-pass gram pipeline
    (dgh) past the candidate broadcast instead of recomputing the gram
    expression per candidate member row — banding's candidate count
    follows the dup rate, not the corpus size, and at sf1 (5 pairs per
    doc) the per-member recompute was ~10 corpus passes of interpreted
    HOF work (19 of q36's 21 s; PROBE_Q36_VERIFY_SF1_r16.json pins the
    6.5x).  Pinned two ways: (a) the per-member gram marker — the
    inlined `transform(array(split(...)))[0]` expression the old shape
    projected ABOVE the join — no longer appears in the executed plan;
    (b) both verify shapes agree on a fixture where one doc
    participates in MANY pairs (the case the old shape recomputed per
    pair)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [Row(doc_id=i, text=base) for i in range(1, 7)] + [
        Row(doc_id=9, text="totally unrelated words over here now friend"),
    ]
    docs = spark.createDataFrame(rows)
    bc = minhash_lsh_pairs(docs, threshold=0.5, verify_broadcast=True)
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "transform(array(split(" not in plan
    got_bc = [(r.a, r.b, r.jac) for r in bc.collect()]
    got_sh = [
        (r.a, r.b, r.jac)
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, verify_broadcast=False
        ).collect()
    ]
    # 6 identical docs -> all 15 pairs at jac 1.0, via every doc
    # sitting in 5 pairs (10 member rows) -- the multi-pair fan-out
    assert got_bc == got_sh
    assert len(got_bc) == 15 and all(j == 1.0 for _, _, j in got_bc)
