"""Distributed connected components — the dedup-cluster former.

Near-dup pair emitters (minhash/simhash/jaccard) produce EDGES; turning
them into "keep one document per duplicate cluster" requires the
connected components of that graph, with a deterministic cluster label
(the minimum member id).

Scale shape: iterative min-label propagation.  Each round is one
hash-shuffle join (neighbor labels) + one groupBy(min) — no driver-side
graph state, edges never leave the cluster.  Rounds needed equal the
graph diameter, and duplicate clusters are near-cliques (diameter ≤ 2-3
in practice) so convergence is a handful of rounds even at corpus
scale; ``max_iter`` bounds the pathological chain.  The per-round
convergence check is a scalar ``count`` — a control-plane signal, not a
data collect.  Each round is checkpointed to keep the plan O(1), and
the previous round's blocks are freed eagerly once its convergence
count has consumed them, so at most two label snapshots are live.

Fault tolerance: the default ``localCheckpoint`` stores blocks on
executors WITHOUT replication — fast, but an executor loss
mid-iteration kills the job unrecoverably.  On a real cluster pass
``checkpoint_dir`` (an HDFS/S3A path): rounds then use reliable
``df.checkpoint()`` files that survive executor loss, at the cost of
one write+read of the (small: id, cluster) label table per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, cluster) for every node in ``edges``, where ``cluster`` is
    the minimum node id reachable from ``id`` (deterministic canonical
    label).  Nodes appear once; isolated nodes don't exist by
    construction (an edge list has no degree-0 entries).

    ``checkpoint_dir``: when set, per-round lineage truncation uses
    reliable checkpoints under this directory (executor-loss tolerant —
    the 100 TB deployment path); when None, executor-local
    checkpoints (single-job local runs).  Results are identical.

    Concurrency contract: the per-round block-freeing identifies each
    checkpoint's RDD by diffing the session's persistent-RDD set, so
    do not persist/cache OTHER DataFrames on this SparkSession from
    another thread while a connected_components call is in flight —
    an interleaved persist could be captured in the diff and freed
    with the round (driver-side single-operator-at-a-time is the
    normal batch shape; concurrent sessions are unaffected)."""
    sc = edges.sparkSession.sparkContext
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)

    def _persisted_ids() -> set:
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    def _ckpt(df: DataFrame) -> tuple[DataFrame, set]:
        """Eagerly checkpoint ``df`` and return the persistent-RDD ids
        the checkpoint registered, so the PREVIOUS round's blocks can
        be freed deterministically once their last consumer (the
        convergence count) has run.  ``df.rdd.unpersist()`` does NOT
        free them (``.rdd`` wraps a derived RDD, measured no-op), and
        waiting for the driver's GC leaves up to max_iter label
        snapshots in executor block storage (ADVICE r03)."""
        before = _persisted_ids()
        out = (
            df.checkpoint()
            if checkpoint_dir is not None
            else df.localCheckpoint()
        )
        return out, _persisted_ids() - before

    def _free(ids: set) -> None:
        m = sc._jsc.getPersistentRDDs()
        for i in ids:
            r = m.get(i)
            if r is not None:
                r.unpersist()

    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
        .distinct()
        .cache()  # every round joins und: without this the upstream
        # pair pipeline (e.g. the whole minhash computation) would
        # re-run once per iteration
    )
    # materialize und's cache OUTSIDE any _ckpt diff window so its
    # persisted RDD id can never be mistaken for a label snapshot
    und.count()
    # checkpoint (not cache) each round: caching materializes the
    # DATA but the logical plan still nests every earlier round, so by
    # ~25 rounds the planner itself OOMs the driver (observed on a
    # 30-node chain).  Checkpointing truncates the lineage to the
    # materialized blocks — plan size stays O(1) per round.
    labels, label_ids = _ckpt(
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
    )
    from pyspark.sql import Observation

    converged = False
    for _ in range(max_iter):
        # each node offers its label to every neighbor; a node keeps
        # the smallest of (its label, best offer)
        offers = (
            und.join(labels, und.s == labels.id)
            .select(F.col("d").alias("id"), "cluster")
            .groupBy("id")
            .agg(F.min("cluster").alias("offer"))
        )
        # the convergence count piggybacks on the checkpoint's own
        # materialization job via observe (a row changed iff its best
        # offer beats its label) — one job per round instead of a
        # separate rounds-deep count join (measured ~2x on the
        # declared q82/q83)
        obs = Observation()
        cand = (
            labels.join(offers, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("offer", "cluster")
                ).alias("cluster"),
                (F.coalesce("offer", F.col("cluster")) < F.col("cluster"))
                .cast("long")
                .alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("chg"))
            .select("id", "cluster")
        )
        new_labels, new_ids = _ckpt(cand)
        changed = obs.get.get("chg") or 0
        # the checkpoint job was the last consumer of the previous
        # round's blocks — free them now; at most two snapshots are
        # ever live (a localCheckpoint is unreadable once freed, so
        # this must stay AFTER the materialization)
        _free(label_ids)
        labels, label_ids = new_labels, new_ids
        if changed == 0:
            converged = True
            break
    und.unpersist()
    if not converged:
        # partial labels are silently WRONG (a path longer than
        # max_iter hasn't finished propagating its minimum) — fail
        # loudly; callers with genuinely deep graphs raise max_iter
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds; the graph has a component with a longer diameter "
            "— raise max_iter"
        )
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Assign every document to a duplicate cluster and pick its
    canonical representative: cluster = min reachable id over the
    near-dup pair graph (singletons cluster with themselves), keep =
    the member with the largest ``size_col`` (ties to the smallest id)
    — "keep the longest copy" is the standard curation rule.  Returns
    (cluster, keep_id, n_docs).  ``checkpoint_dir``: see
    :func:`connected_components` (pass on clusters)."""
    cc = connected_components(
        pairs, max_iter=max_iter, checkpoint_dir=checkpoint_dir
    )
    labeled = docs.select(
        F.col(id_col).alias("id"), F.col(size_col).alias("_sz")
    ).join(cc, "id", "left")
    labeled = labeled.withColumn(
        "cluster", F.coalesce("cluster", F.col("id"))
    )
    return (
        labeled.groupBy("cluster")
        .agg(
            F.min(
                F.struct(
                    # NULL size must LOSE, not win: a NULL first field
                    # sorts before every value in struct ordering, so a
                    # doc with unknown length would otherwise always be
                    # chosen over the genuinely longest member
                    F.coalesce(
                        -F.col("_sz").cast("long"),
                        F.lit((1 << 63) - 1),
                    ).alias("_neg"),
                    F.col("id").alias("id"),
                )
            )["id"].alias("keep_id"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("cluster")
    )
