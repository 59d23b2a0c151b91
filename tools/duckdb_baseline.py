#!/usr/bin/env python
"""Same-box DuckDB baseline: run every oracle SQL at a given sf dir,
best-of-2 per query, 32 threads.  Prints one JSON line mirroring
bench.py's headline so the 2x comparison is same-box, same-files,
same-session-window (the r4 verdict's acceptance protocol)."""
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mandoline_spark.queries import TABLES  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def run(sf_dir: str, canonical: bool | None = None) -> dict:
    """Measure the full oracle surface; write DUCKDB_DETAIL.json and
    return the detail dict.  Callable from bench.py so every BENCH
    ships a SAME-SESSION DuckDB pair (VERDICT r7 #5).  Directory
    tables (the multi-file bench fixture, r11 verdict #3) are read via
    a glob; ``canonical`` forces the committed-vs-scratch detail-name
    decision when the dir name no longer encodes the sf (bench passes
    a temp fixture path).)"""
    os.environ["MANDOLINE_TEST_SF"] = sf_dir
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    oracles = entry.oracle_sql()
    # warmup: touch every table once
    con.execute("SELECT count(*) FROM lineitem").fetchall()
    times = {}
    for _pass in range(2):
        for name, sql in oracles.items():
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            times[name] = min(times.get(name, dt), dt)
    total = round(sum(times.values()), 4)

    # Throughput twin of bench.py's concurrent8_wall_sec: the same
    # oracle set submitted from 8 threads (each a cursor on the shared
    # database, DuckDB's intra-query parallelism dividing the same 32
    # cores), so the Spark-vs-DuckDB comparison exists for BOTH the
    # sequential power run and the pipelined throughput run.
    from concurrent.futures import ThreadPoolExecutor

    items = list(oracles.items())

    def _one(kv):
        name, sql = kv
        cur = con.cursor()
        try:
            cur.execute(sql).fetchall()
        finally:
            cur.close()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(8) as pool:
        list(pool.map(_one, items))
    concurrent8 = round(time.perf_counter() - t0, 4)

    detail = {"queries": {k: round(v, 4) for k, v in times.items()},
              "total": total, "n": len(times), "sf_dir": sf_dir,
              "concurrent8_wall_sec": concurrent8}
    # Same record-vs-scratch split as bench.py's BENCH_DETAIL write:
    # only SPARK_GRAFT_RECORD_DETAIL=1 (the builder, committing a run)
    # touches the canonical committed name; everything else — the
    # driver's per-round bench included — writes the gitignored _last
    # file so `git status` stays clean (VERDICT r8 "What's wrong #1").
    record = os.environ.get("SPARK_GRAFT_RECORD_DETAIL") == "1"
    if canonical is None:
        canonical = sf_dir.rstrip("/").endswith("sf0.1")
    tag = "" if canonical else "_debug"
    name = f"DUCKDB_DETAIL{tag}.json" if record else \
        f"DUCKDB_DETAIL_last{tag}.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", name), "w") as f:
        json.dump(detail, f, indent=1)
    return detail


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    detail = run(sf_dir)
    print(json.dumps({"metric": "duckdb_oracle_total",
                      "value": detail["total"], "unit": "sec",
                      "n_queries": detail["n"],
                      "concurrent8_wall_sec": detail["concurrent8_wall_sec"]}))


if __name__ == "__main__":
    main()
