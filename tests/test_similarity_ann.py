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
