#!/usr/bin/env python
"""Multi-row-group layout probe for the q91/q15/q92 plateau (r9 judge
ask #1).

The standing explanation for the three >2x floor-adjusted queries is
"single-file single-row-group fixture => the fact scan collapses to one
task".  This probe measures it directly: lineitem/orders/documents are
rewritten into N part files (scratch dir; fixtures untouched) and the
three queries are timed on both layouts under both the bench scan conf
(maxPartitionBytes=512m — small files BIN-PACK into one partition) and
a split-friendly conf (maxPartitionBytes=1m, openCostInBytes=64k — one
task per file).  Four cells per query:

    orig/bench    — the committed bench number's layout
    multi/bench   — file count alone (packing still collapses it)
    orig/split    — byte-range splits cannot cross a row-group boundary,
                    so a 1-row-group file stays 1 task (control)
    multi/split   — the 100 TB layout: parallel scan tasks

If the plateau is the fixture, multi/split drops and the other three
don't.  Prints one JSON line; numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = int(os.environ.get("RG_PROBE_FILES", "16"))
REPS = int(os.environ.get("RG_PROBE_REPS", "7"))
REWRITE = ("lineitem", "orders", "documents")
# r10 set: the three then-weak queries; r11 added q104 (borderline 2.2x,
# oracle reading at the 80ms threshold) and q84 (next densest explode)
QUERIES = tuple(
    os.environ.get(
        "RG_PROBE_QUERIES",
        "q91_star_join q15_window_lag q92_word_entropy "
        "q104_shipping_priority q84_tfidf_top_term",
    ).split()
)
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BENCH_CONF = {
    "spark.sql.files.maxPartitionBytes": "512m",
    "spark.sql.files.openCostInBytes": "4194304",
}
SPLIT_CONF = {
    "spark.sql.files.maxPartitionBytes": "1m",
    "spark.sql.files.openCostInBytes": "65536",
}


def build_multi(dst: str) -> None:
    """N-part-file directory tables for the rewrite set, symlinks for
    the rest — fragment row slices via pyarrow, one row group each."""
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in ALL_TABLES:
        src = os.path.join(SF, f"{t}.parquet")
        out = os.path.join(dst, f"{t}.parquet")
        if t not in REWRITE:
            if not os.path.exists(out):
                os.symlink(src, out)
            continue
        os.makedirs(out, exist_ok=True)
        tbl = pq.read_table(src)
        n = tbl.num_rows
        per = (n + N_FILES - 1) // N_FILES
        for i in range(N_FILES):
            frag = tbl.slice(i * per, per)
            if frag.num_rows == 0:
                break
            pq.write_table(
                frag, os.path.join(out, f"part-{i:05d}.parquet")
            )


def main() -> None:
    from mandoline_spark.queries import QUERIES as Q
    from mandoline_spark.sources.session import get_spark

    spark = get_spark("rowgroup_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    scratch = tempfile.mkdtemp(prefix="rg_probe_")
    multi = os.path.join(scratch, "multi")
    build_multi(multi)

    def run(df) -> None:
        # the bench measurement kernel: full plan execution, rows
        # counted JVM-side, fresh QueryExecution per pass
        df.select("*")._jdf.queryExecution().toRdd().count()

    def scan_tasks(df) -> int:
        rdd = df.select("*")._jdf.queryExecution().toRdd()
        return rdd.getNumPartitions()

    results: dict[str, dict] = {}
    layouts = {"orig": SF, "multi": multi}
    confs = {"bench": BENCH_CONF, "split": SPLIT_CONF}
    # warmup: codegen + python workers on the bench conf
    for k, v in BENCH_CONF.items():
        spark.conf.set(k, v)
    run(Q["q10_agg_hash"](spark, SF))

    for qname in QUERIES:
        results[qname] = {}
        for lname, ldir in layouts.items():
            for cname, conf in confs.items():
                for k, v in conf.items():
                    spark.conf.set(k, v)
                run(Q[qname](spark, ldir))  # per-cell warm pass
                times = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    run(Q[qname](spark, ldir))
                    times.append(time.perf_counter() - t0)
                times.sort()
                cell = {
                    "median": round(statistics.median(times), 4),
                    "min": round(times[0], 4),
                    "max": round(times[-1], 4),
                }
                results[qname][f"{lname}/{cname}"] = cell
                print(
                    f"# {qname} {lname}/{cname}: {cell}",
                    file=sys.stderr,
                    flush=True,
                )
    # scan parallelism evidence: leaf partition counts per layout/conf
    parts = {}
    for lname, ldir in layouts.items():
        for cname, conf in confs.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            li = spark.read.parquet(os.path.join(ldir, "lineitem.parquet"))
            parts[f"lineitem:{lname}/{cname}"] = li.rdd.getNumPartitions()
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({
        "probe": "rowgroup_plateau",
        "sf_dir": SF,
        "n_files": N_FILES,
        "reps": REPS,
        "queries": results,
        "scan_partitions": parts,
    }))


if __name__ == "__main__":
    main()
