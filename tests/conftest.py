from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from mandoline_spark.sources.session import get_spark

    s = get_spark("mandoline_spark_tests")
    yield s


@pytest.fixture()
def store(spark, tmp_path):
    from mandoline_spark.store import Store

    return Store(spark=spark, root=str(tmp_path))
