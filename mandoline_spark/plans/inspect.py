"""Physical-plan inspection over ``df._jdf`` explain output.

String-level on purpose: the explain text is the only stable public
surface across Spark versions, and these helpers are used in tests to
pin scale-critical plan properties (pushdown, broadcast, codegen) so a
regression shows up as a failing assertion, not a silent 10x slowdown.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _bracketed_body(text: str, start: int) -> str | None:
    """Content of the bracket pair opening at ``text[start] == '['`` —
    depth-aware, so an ``In(x, [1,2,3])`` filter's inner ']' does not
    truncate the list the way a ``[^\\]]*`` regex would."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "[":
            depth += 1
        elif text[i] == "]":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return None


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the Parquet scan (empty when nothing pushed).
    A range predicate that does NOT appear here is being evaluated
    post-scan — row groups that could have been skipped are read."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: (?=\[)", text):
        body = _bracketed_body(text, m.end())
        if body is None:
            continue
        # split on top-level commas only — filter args contain commas
        # and In(...) values contain a nested [..] list, so both paren
        # and bracket depth count
        depth, cur = 0, ""
        for ch in body:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            if ch == "," and depth == 0:
                if cur.strip():
                    out.append(cur.strip())
                cur = ""
            else:
                cur += ch
        if cur.strip():
            out.append(cur.strip())
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """TOP-LEVEL column names in the scan's ReadSchema — column pruning
    check: a 2-column projection reading 10 columns wastes IO
    proportionally.  Parsed depth-aware: nested ``struct<...>`` /
    ``map<...>`` fields and ``decimal(p,s)`` commas must neither leak
    inner names nor truncate the list (a ``[^>]*`` regex stops at the
    first inner '>')."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct", text):
        start = m.end()
        if start >= len(text) or text[start] != "<":
            continue
        depth = 0
        body_start, body = start + 1, None
        for i in range(start, len(text)):
            if text[i] == "<":
                depth += 1
            elif text[i] == ">":
                depth -= 1
                if depth == 0:
                    body = text[body_start:i]
                    break
        if body is None:
            continue
        depth, cur = 0, ""
        fields: list[str] = []
        for ch in body:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            if ch == "," and depth == 0:
                fields.append(cur)
                cur = ""
            else:
                cur += ch
        fields.append(cur)
        for field in fields:
            name = field.split(":", 1)[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct whole-stage-codegen span ids; wider spans = more of the
    plan runs as generated JVM code instead of interpreted operators."""
    text = explain_str(df)
    return {int(m) for m in re.findall(r"codegen id : (\d+)", text)}
