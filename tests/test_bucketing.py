"""Bucketed tables co-locate join keys: a join between two tables
bucketed the same way runs with NO exchange on either side — the
100 TB answer to repeated large-to-large joins on a stable key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mandoline_spark.plans import explain_str


@pytest.fixture(scope="module")
def warehouse(spark):
    # default warehouse dir; managed tables are deleted by DROP TABLE
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable("orders_b")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable("lineitem_b")
    )
    yield spark
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    j = (
        spark.table("orders_b")
        .hint("merge")  # force SMJ: at this SF Spark would broadcast
        .join(spark.table("lineitem_b"), "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
    )
    text = explain_str(j)
    # join inputs are pre-partitioned by bucket: NO shuffle anywhere —
    # not for the join, and not for the same-key groupBy above it
    assert "SortMergeJoin" in text, text
    assert "Exchange hashpartitioning" not in text, text
    assert "Bucketed: true" in text

    # and the result matches the unbucketed join
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    want = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
