"""Namespace-load smoke test (the reference's namespaces_test.clj):
every module imports cleanly and exposes its public surface."""

from __future__ import annotations

import importlib

import pytest

MODULES = [
    "mandoline_spark",
    "mandoline_spark.core.slice",
    "mandoline_spark.core.slab",
    "mandoline_spark.core.chunk",
    "mandoline_spark.core.metadata",
    "mandoline_spark.store",
    "mandoline_spark.reader",
    "mandoline_spark.writer",
    "mandoline_spark.maintenance",
    "mandoline_spark.queries",
    "mandoline_spark.functions.dedup",
    "mandoline_spark.functions.similarity",
    "mandoline_spark.functions.text",
    "mandoline_spark.functions.multimodal",
    "mandoline_spark.operators",
    "mandoline_spark.operators.joins",
    "mandoline_spark.plans",
    "mandoline_spark.streaming",
    "mandoline_spark.sources.session",
    "mandoline_spark.sources.ndarray_import",
]


@pytest.mark.parametrize("mod", MODULES)
def test_imports(mod):
    importlib.import_module(mod)


def test_query_surface_is_complete():
    """Every declared query has an oracle or is a documented
    rows-only check; entry points resolve."""
    import __spark_entry__ as e
    from mandoline_spark.queries import ORACLES, QUERIES

    assert set(e.queries()) == set(QUERIES)
    assert set(e.oracle_sql()) == set(ORACLES)
    # every query now carries an oracle: q38 joined via the literal-
    # VALUES brute-force (r3 verdict item 1)
    assert set(QUERIES) == set(ORACLES)
    assert len(QUERIES) >= 51
