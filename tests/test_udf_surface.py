"""The full Python UDF surface claimed by Q33: scalar pandas UDF,
grouped-agg pandas UDF (UDAF), iterator-of-batches mapInPandas, and a
Python UDTF — each against an equivalent built-in computation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

SF = "/root/testdata/sf0.001"


def test_scalar_pandas_udf(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    @pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    got = li.select(F.sum(net("l_extendedprice", "l_discount")).alias("s"))
    want = li.select(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s")
    )
    assert abs(got.first()["s"] - want.first()["s"]) < 1e-6


def test_grouped_agg_pandas_udaf(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    @pandas_udf("double")
    def mean_qty(q: pd.Series) -> float:
        return float(q.mean())

    got = (
        li.groupBy("l_returnflag")
        .agg(mean_qty("l_quantity").alias("m"))
        .orderBy("l_returnflag")
        .collect()
    )
    want = (
        li.groupBy("l_returnflag")
        .agg(F.avg("l_quantity").alias("m"))
        .orderBy("l_returnflag")
        .collect()
    )
    for g, w in zip(got, want):
        assert g["l_returnflag"] == w["l_returnflag"]
        assert abs(g["m"] - w["m"]) < 1e-9


def test_python_udtf(spark):
    @udtf(returnType="word string, n int")
    class Explode:
        def eval(self, text: str):
            for w in text.split():
                yield w, len(w)

    Explode_r = spark.udtf.register("explode_words", Explode)
    got = spark.sql(
        "SELECT t.word, t.n FROM explode_words('the quick brown fox') t "
        "ORDER BY word"
    ).collect()
    assert [(r["word"], r["n"]) for r in got] == [
        ("brown", 5),
        ("fox", 3),
        ("quick", 5),
        ("the", 3),
    ]


def test_map_in_pandas_batches(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_quantity")

    def double_qty(batches):
        for pdf in batches:
            pdf["l_quantity"] = pdf["l_quantity"] * 2
            yield pdf

    got = li.mapInPandas(double_qty, "l_quantity double").agg(
        F.sum("l_quantity").alias("s")
    )
    want = li.agg((F.sum("l_quantity") * 2).alias("s"))
    assert abs(got.first()["s"] - want.first()["s"]) < 1e-6
