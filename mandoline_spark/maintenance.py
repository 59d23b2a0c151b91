"""Store maintenance: garbage collection of unreferenced chunks and
superseded index generations.

The reference reserves chunk reference counting for GC but stubs it
(``chunk-refs``/``update-chunk-refs``, protocol.clj:23-42; the write
path passes a constant -1, impl.clj:253-254).  The Spark shape computes
reference counts at collection time instead of maintaining them online:
a chunk is live iff some committed version's current index references
its hash.  That collects failed-ingest leftovers (uncommitted versions
are invisible to readers and to liveness) and overwritten chunks whose
last referencing version was itself vacuumed away — while time travel
to every committed version keeps working, because each committed
version's copy-forward index is scanned.

Single-maintainer assumption: like the reference's ``destroy-dataset``,
vacuum must not race concurrent writers to the same dataset.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .store import Connection


def vacuum(conn: Connection) -> dict:
    """Remove (a) chunk blobs unreferenced by every committed version,
    (b) superseded index generations, and (c) index directories of
    uncommitted versions.  Returns counts of what was kept/removed."""
    stats = {
        "chunks_kept": 0,
        "chunks_removed": 0,
        "index_gens_removed": 0,
        "uncommitted_versions_removed": 0,
    }
    committed = conn.version_ids()

    # -- (c) uncommitted version index trees ---------------------------------
    index_root = os.path.join(conn.path, "index")
    if os.path.isdir(index_root):
        for d in os.listdir(index_root):
            if d.startswith("v="):
                vid = int(d[2:])
                if vid not in committed:
                    shutil.rmtree(os.path.join(index_root, d))
                    stats["uncommitted_versions_removed"] += 1

    # -- (b) superseded generations ------------------------------------------
    for vid, token in conn.versions():
        for var in token.get("variables", {}):
            gens = conn.index_gens(vid, var)
            for g in gens[:-1]:
                shutil.rmtree(conn.index_path(vid, var, g))
                stats["index_gens_removed"] += 1

    # -- (a) unreferenced chunks ----------------------------------------------
    conn.invalidate_cache()
    chunks = conn.chunks_df()
    if chunks is None:
        return stats
    refs = None
    for vid, token in conn.versions():
        for var in token.get("variables", {}):
            idx = conn.index_df(vid, var)
            if idx is not None:
                h = idx.select(F.col("chunk_hash").alias("hash"))
                refs = h if refs is None else refs.unionByName(h)
    total = chunks.count()
    live = (
        chunks.join(refs.distinct(), "hash", "left_semi")
        if refs is not None
        else chunks.limit(0)
    )

    tmp = conn.chunks_path() + ".gc"
    shutil.rmtree(tmp, ignore_errors=True)
    live.write.mode("overwrite").parquet(tmp)
    kept = conn.spark.read.parquet(tmp).count()
    old = conn.chunks_path() + ".old"
    os.rename(conn.chunks_path(), old)
    os.rename(tmp, conn.chunks_path())
    shutil.rmtree(old)
    conn.invalidate_cache()

    stats["chunks_kept"] = kept
    stats["chunks_removed"] = total - kept
    return stats
