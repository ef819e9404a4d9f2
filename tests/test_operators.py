"""Operator-layer tests: dedup windows, joins, pivots, unions (SURVEY
§2.4–§2.6 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2b_dataframework_spark.operators.dedup import keep_latest
from d2b_dataframework_spark.operators.joins import broadcast_dim_join, left_join_fill_zero
from d2b_dataframework_spark.operators.pivots import pivot_wide
from d2b_dataframework_spark.operators.unions import concat


def test_keep_latest_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1),
            ("a", "2024-01-02 00:00:00", 2),
            ("a", "2024-01-02 00:00:00", 3),  # ts tie → tiebreaker wins
            ("b", None, 4),
            ("b", "2024-01-01 00:00:00", 5),  # valid ts beats null
        ],
        "k string, ts_raw string, v int",
    ).withColumn("ts", F.to_timestamp("ts_raw"))
    out = {r["k"]: r["v"] for r in keep_latest(df, "k", "ts", tiebreakers=["v"]).collect()}
    assert out == {"a": 3, "b": 5}


def test_left_join_fill_zero_types(spark):
    left = spark.createDataFrame([("p1",), ("p2",)], "id string")
    right = spark.createDataFrame([("p1", 7)], "id string, likes long")
    out = left_join_fill_zero(left, right, "id", fill_cols=["likes"], cast="long")
    rows = {r["id"]: r["likes"] for r in out.collect()}
    assert rows == {"p1": 7, "p2": 0}
    assert dict(out.dtypes)["likes"] == "bigint"


def test_broadcast_dim_join_plans_broadcast(spark):
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(1, "x")], "k long, name string")
    out = broadcast_dim_join(fact, dim, fact.k == dim.k, "left")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_pivot_wide_with_declared_values(spark):
    df = spark.createDataFrame(
        [("d1", "click", 1.0), ("d1", "view", 2.0), ("d2", "click", 3.0)],
        "day string, metric string, v double",
    )
    out = pivot_wide(df, "day", "metric", "v", agg="sum", pivot_values=["click", "view"])
    rows = {r["day"]: (r["click"], r["view"]) for r in out.collect()}
    assert rows == {"d1": (1.0, 2.0), "d2": (3.0, None)}


def test_concat_aligns_by_name_null_fills(spark):
    a = spark.createDataFrame([(1, "x")], "id long, only_a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, only_b double")
    out = concat([a, b])
    assert set(out.columns) == {"id", "only_a", "only_b"}
    rows = {r["id"]: (r["only_a"], r["only_b"]) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, 9.5)}
