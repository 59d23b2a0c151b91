"""Driver-style correctness gate: every queries() entry vs its DuckDB
oracle on the same parquet fixtures (sf from MANDOLINE_TEST_SF, default
0.001 for speed; the driver itself runs sf0.01).

Comparison mimics the driver: column names sorted, rows order-
insensitive, values compared exactly for non-floats and to 1e-9
relative for floats (the declared queries round anything
order-sensitive, so this is strictly tighter than a hash match needs).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from mandoline_spark.queries import TABLES

SF_DIR = os.environ.get("MANDOLINE_TEST_SF", "/root/testdata/sf0.001")
# lazily-built oracles (q38's literal VALUES) read this env var to bind
# to the sf the Spark side runs at; the driver leaves it unset and gets
# the sf0.01 default it compares at
os.environ["MANDOLINE_TEST_SF"] = SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _assert_equal(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        # the driver hashes stringified values, so an integer column on
        # one side vs a float on the other (e.g. DuckDB HUGEINT ->
        # float64 in pandas) is a real mismatch: "42" != "42.0"
        assert not (
            {gv.dtype.kind, wv.dtype.kind} == {"i", "f"}
        ), (
            f"{name}.{c}: dtype kind mismatch spark={gv.dtype} "
            f"oracle={wv.dtype} (cast the oracle aggregate, e.g. "
            f"HUGEINT sums to BIGINT)"
        )
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            for i, (a, b) in enumerate(zip(gv, wv)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert not (pd.isna(a) or pd.isna(b)), f"{name}.{c}[{i}]: {a} vs {b}"
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}.{c}[{i}]: {a} != {b}"
                )
        else:
            mism = (gv.astype(str) != wv.astype(str)).to_numpy().nonzero()[0]
            assert len(mism) == 0, (
                f"{name}.{c}: first mismatch row {mism[:5]}: "
                f"{gv.iloc[mism[0]]!r} != {wv.iloc[mism[0]]!r}"
            )


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    got = queries[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check, like the driver's
        return
    want = duck.execute(oracles[name]).fetchdf()
    _assert_equal(name, got, want)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
