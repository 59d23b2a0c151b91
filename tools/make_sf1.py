#!/usr/bin/env python
"""Derive an sf1 (10x) dataset from the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1} only; the scaling record (r12
verdict #3 — convert the fixed-job-constants *argument* behind the
floor-adjusted tail into measured *evidence*) needs a 10x point.  This
derives one deterministically from sf0.1: each scaled table is the
union of 10 key-shifted replicas, so every join stays consistent
(foreign keys shift together with the primary keys they reference) and
per-key cardinalities — lines per order, orders per customer, events
per user — are preserved exactly.  Dimension tables (region, nation)
keep their reference-data size, as TPC-H itself does; nationkey
references therefore stay unshifted.  documents/embeddings content is
replicated VERBATIM under fresh ids: dedup/ANN workloads keep (and
scale) their duplicate structure, which is the realistic shape for a
crawl 10x the size.

Both engines in the bench pair read the SAME derived files, so the
ratio is well-defined regardless of how faithful the derivation is to
"true" TPC-H sf1.

Usage: python tools/make_sf1.py [out_dir]   (default /root/repo/.derived/sf1)
"""
from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# (table, [key columns shifted by their own table's stride]) — a key
# column's stride is max(key)+1 of the table that OWNS it, so replicas
# never collide and cross-table references follow their target.
STRIDE_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

COPY_TABLES = ["region", "nation"]
SCALE_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.derived/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")

    strides: dict[tuple[str, str], int] = {}

    def stride(col: str) -> int:
        owner, key = STRIDE_OWNER[col]
        if (owner, key) not in strides:
            mx = con.execute(
                f"SELECT max({key}) FROM read_parquet("
                f"'{SRC}/{owner}.parquet')"
            ).fetchone()[0]
            strides[(owner, key)] = int(mx) + 1
        return strides[(owner, key)]

    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied")

    for t in SCALE_TABLES:
        cols = [
            (c[0], c[1])
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(REPLICAS):
            proj = ", ".join(
                # the cast keeps each column's parquet type identical
                # to the source (an int key + integer literal would
                # otherwise widen)
                f"CAST({c} + {i * stride(c)} AS {typ}) AS {c}"
                if c in STRIDE_OWNER
                else c
                for c, typ in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1 fixture at {out}")


if __name__ == "__main__":
    main()
