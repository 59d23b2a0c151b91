#!/usr/bin/env python
"""ANN recall curves at scale (r9 verdict #4).

q40/q66 verify the declared invariants (exactness within probed
buckets, in-corpus top-1 identity) but never MEASURE recall against
the exact answer on a corpus where probing misses.  This probe builds
clustered synthetic embeddings at 10x and 100x the sf0.1 fixture
(20k / 200k vectors, dim 64, Gaussian around shared cluster centers —
the shape real text-embedding corpora have), runs out-of-corpus
perturbed queries, and records recall@1 vs the probe knob:

- IVF: n_probe in {1, 2, 4, 8, 16} at n_cells=16 (n_probe=16 is
  exhaustive and must hit 1.0 by construction);
- LSH: n_planes in {4, 8, 12, 16} (more planes = smaller buckets =
  lower recall; single-band, so the curve falls fast — the banded
  multi-probe variant is the dedup path, not this one).

Exact baseline: cosine_topk (blocked-BLAS brute force).  Prints one
JSON line; curves are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def synth(n: int, dim: int = 64, n_clusters: int = 10, seed: int = 7):
    """Clustered corpus + 100 out-of-corpus queries: each query is a
    corpus vector plus noise, so its exact top-1 is a nontrivial
    nearest neighbor (usually, not always, its source vector)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    corpus = centers[assign] + rng.normal(0, 0.35, (n, dim))
    qsrc = rng.integers(0, n, 100)
    queries = corpus[qsrc] + rng.normal(0, 0.15, (100, dim))
    return corpus.astype(np.float32), queries.astype(np.float32)


def to_parquet(path: str, vecs: np.ndarray, id_base: int = 0) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(
                range(id_base, id_base + len(vecs)), pa.int64()
            ),
            "embedding": pa.array(
                [v.tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, path)


def top1_map(df) -> dict[int, int]:
    return {
        r["qid"]: r["vec_id"]
        for r in df.filter("sim is not null").collect()
        if r["qid"] is not None
    }


def main() -> None:
    from mandoline_spark.functions import similarity as sim
    from mandoline_spark.sources.session import get_spark

    spark = get_spark("scale_check_ann")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "16")

    out: dict = {"probe": "ann_recall", "dim": 64, "queries": 100}
    scratch = tempfile.mkdtemp(prefix="ann_recall_")
    # scoping knobs so a partial re-measure doesn't re-pay the whole
    # sweep (the x100 exact baseline alone is ~2-3 min):
    #   ANN_SCALES=x100        run only these comma-separated scales
    #   ANN_SKIP_IVF=1         skip the IVF sweep
    #   ANN_SKIP_LSH=1         skip the LSH sweep
    scales = os.environ.get("ANN_SCALES", "x10,x100").split(",")
    skip_ivf = os.environ.get("ANN_SKIP_IVF") == "1"
    skip_lsh = os.environ.get("ANN_SKIP_LSH") == "1"
    for label, n in (("x10", 20_000), ("x100", 200_000)):
        if label not in scales:
            continue
        corpus_np, queries_np = synth(n)
        cpath = os.path.join(scratch, f"corpus_{label}.parquet")
        qpath = os.path.join(scratch, f"queries_{label}.parquet")
        to_parquet(cpath, corpus_np)
        to_parquet(qpath, queries_np, id_base=10_000_000)
        corpus = spark.read.parquet(cpath)
        queries = spark.read.parquet(qpath)

        t0 = time.perf_counter()
        exact = top1_map(sim.cosine_topk(queries, corpus, k=1))
        exact_sec = round(time.perf_counter() - t0, 2)

        curves: dict = {"exact_sec": exact_sec, "ivf": {}, "lsh": {}}
        cells = 16
        centroids = None
        if not skip_ivf:
            centroids = sim.train_ivf_centroids(corpus, n_cells=cells)
        for n_probe in () if skip_ivf else (1, 2, 4, 8, 16):
            t0 = time.perf_counter()
            got = top1_map(
                sim.ivf_topk(
                    queries,
                    corpus,
                    k=1,
                    n_cells=cells,
                    n_probe=n_probe,
                    centroids=centroids,
                )
            )
            sec = round(time.perf_counter() - t0, 2)
            hits = sum(got.get(q) == v for q, v in exact.items())
            curves["ivf"][str(n_probe)] = {
                "recall@1": round(hits / len(exact), 3),
                "sec": sec,
            }
        for n_planes, bits in () if skip_lsh else (
            (4, 0), (8, 0), (12, 0), (16, 0),
            (12, 1), (16, 1), (12, 2), (16, 2),
        ):
            t0 = time.perf_counter()
            got = top1_map(
                sim.cosine_topk_lsh(
                    queries,
                    corpus,
                    k=1,
                    n_planes=n_planes,
                    n_probe_bits=bits,
                )
            )
            sec = round(time.perf_counter() - t0, 2)
            hits = sum(got.get(q) == v for q, v in exact.items())
            curves["lsh"][f"{n_planes}p{bits}b"] = {
                "recall@1": round(hits / len(exact), 3),
                "sec": sec,
            }
        out[label] = curves
        print(f"# {label} done: {curves}", file=sys.stderr, flush=True)

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
