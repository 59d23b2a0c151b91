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


@pytest.fixture()
def store_factory(spark, tmp_path_factory):
    """Fresh dataset per call — safe under hypothesis, which runs many
    examples per test invocation of the (function-scoped) fixture."""
    from mandoline_spark.store import Store

    counter = [0]

    def make():
        counter[0] += 1
        root = tmp_path_factory.mktemp(f"hypo{counter[0]}")
        return Store(spark=spark, root=str(root)).create_dataset("ds")

    return make
