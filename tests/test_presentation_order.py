"""Order-sensitive check of every ordered query's presentation
contract (ADVICE r8): tests/test_oracle_parity.py canonicalizes BOTH
sides before comparing, so it never sees row order — yet ~40 queries
deliver their ORDER BY through custom machinery (psort's gather-sort,
osort's catalog-stats cutover, ranged()'s below-compute range
exchange) whose contract is "same total order as ``orderBy``".

This suite closes that gap without tie flakiness: it parses the
oracle SQL's top-level ORDER BY column list and asserts the collected
Spark output's key-tuple sequence is non-decreasing under Spark's
sort semantics (NULLS FIRST ascending, NaN greater than any value).
Combined with the parity suite's multiset equality this pins the row
sequence up to permutation of exact key ties — the strongest
order guarantee either engine makes.
"""

from __future__ import annotations

import math
import os
import re

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("MANDOLINE_TEST_SF", "/root/testdata/sf0.001")
os.environ["MANDOLINE_TEST_SF"] = SF_DIR


def _parse_order_keys(sql: str) -> list[tuple[str, bool]] | None:
    """Top-level ORDER BY of ``sql`` as [(column, ascending)], or None.

    Only plain (optionally table-qualified) column references parse; a
    window-function ORDER BY deep in the query never matches because
    the tail would carry trailing SQL the full-match rejects."""
    i = sql.upper().rfind("ORDER BY")
    if i < 0:
        return None
    tail = re.sub(r"\s+LIMIT\s+\d+\s*$", "", sql[i + len("ORDER BY"):],
                  flags=re.I).strip()
    keys: list[tuple[str, bool]] = []
    for part in tail.split(","):
        m = re.fullmatch(r"([A-Za-z_][\w.]*)\s*(ASC|DESC)?",
                         part.strip(), re.I)
        if m is None:
            return None
        keys.append((m.group(1).split(".")[-1],
                     (m.group(2) or "ASC").upper() == "ASC"))
    return keys


def _rank(v) -> tuple:
    """Spark ascending sort key: NULL first, NaN above every value."""
    if v is None:
        return (0,)
    if isinstance(v, float) and math.isnan(v):
        return (2,)
    return (1, v)


def _in_order(rows, keys) -> int | None:
    """Index of the first adjacent inversion, or None if sorted."""
    for i in range(len(rows) - 1):
        for col, asc in keys:
            a, b = _rank(rows[i][col]), _rank(rows[i + 1][col])
            if a == b or (a[0] == b[0] == 1 and rows[i][col] == rows[i + 1][col]):
                continue
            lt = a < b if a[0] == b[0] else a[0] < b[0]
            if lt != asc:
                return i
            break
    return None


def _ordered_queries():
    oracles = entry_mod.oracle_sql()
    out = []
    for name, sql in sorted(oracles.items()):
        keys = _parse_order_keys(sql)
        if keys:
            out.append((name, keys))
    return out

_ORDERED = _ordered_queries()


def test_order_coverage_floor():
    """The parse must keep covering the ordered surface — a refactor
    that breaks the ORDER BY parse would silently skip everything."""
    assert len(_ORDERED) >= 80, [n for n, _ in _ORDERED]


@pytest.mark.parametrize("name,keys", _ORDERED,
                         ids=[n for n, _ in _ORDERED])
def test_rows_arrive_in_declared_order(name, keys, spark):
    df = entry_mod.queries()[name](spark, SF_DIR)
    missing = [c for c, _ in keys if c not in df.columns]
    assert not missing, f"{name}: ORDER BY keys {missing} not in output"
    rows = df.collect()
    bad = _in_order(rows, keys)
    assert bad is None, (
        f"{name}: rows {bad}/{bad + 1} out of declared order "
        f"{keys}: {rows[bad]} then {rows[bad + 1]}"
    )
