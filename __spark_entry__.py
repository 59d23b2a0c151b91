"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship aggregation (TPC-H Q1 core) on sf0.001;
``queries``/``oracle_sql`` expose the full declared surface from
SURVEY.md §2B, implemented in :mod:`mandoline_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mandoline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q10_agg_hash"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
