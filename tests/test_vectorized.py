"""Vectorized surfaces: batch-mode consume handlers and the UDF/UDAF/
UDTF inventory (SURVEY §2B UDF table)."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kaflow_spark.app import App
from kaflow_spark.params import FromValue, Json
from kaflow_spark.testclient import TestClient


def test_consume_batches_vectorized_handler(spark):
    app = App()

    @app.consume_batches(topic="nums", sink_topics=("doubled",), value=Json)
    def double(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["value"].map(lambda v: {"n": v["n"] * 2})
        out = pd.DataFrame({"value": vals})
        return out[out["value"].map(lambda v: v["n"] > 2)]  # filter too

    client = TestClient(app, spark)
    assert json.loads(client.publish("nums", b'{"n": 5}').value) == {"n": 10}
    assert client.publish("nums", b'{"n": 1}') is None  # filtered (2 <= 2)
    assert client.publish("nums", b"not json") is None  # dead-lettered
    assert len(client.last_dlq) == 1


def test_scalar_pandas_udf(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def celsius_to_f(c: pd.Series) -> pd.Series:
        return c * 9.0 / 5.0 + 32.0

    df = spark.createDataFrame([(0.0,), (100.0,)], "c double")
    out = sorted(r[0] for r in df.select(celsius_to_f("c")).collect())
    assert out == [32.0, 212.0]


def test_grouped_agg_pandas_udaf(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v).mean()))

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0)], "k string, v double"
    )
    out = {r["k"]: r["g"] for r in df.groupBy("k").agg(geo_mean("v").alias("g")).collect()}
    assert abs(out["a"] - 4.0) < 1e-9
    assert abs(out["b"] - 3.0) < 1e-9


def test_grouped_map_apply_in_pandas(spark):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = df.groupBy("k").applyInPandas(demean, "k string, v double").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r["v"])
    assert sorted(by_key["a"]) == [-1.0, 1.0]
    assert by_key["b"] == [0.0]


def test_python_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield w, i

    spark.udtf.register("tokenize", Tokenize)
    out = spark.sql(
        "SELECT word, pos FROM tokenize('one two three')"
    ).collect()
    assert [(r["word"], r["pos"]) for r in out] == [
        ("one", 0),
        ("two", 1),
        ("three", 2),
    ]
