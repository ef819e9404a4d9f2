"""Heavy-hitter operator: hand-computed examples plus the declarative
twin (the engine's Arrow-stage policy — every mapInPandas stage must
hash-match a pure-DataFrame equivalent on the same input)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from d2b_dataframework_spark.operators.frequency import (
    heavy_hitter_candidates,
    heavy_hitters,
)

pytestmark = pytest.mark.single_leg


def test_heavy_hitters_hand_computed(spark):
    """a x5, b x3, c x1, d x1 at phi=0.3: N=10, thr=ceil(3)=3 -> a, b."""
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: (r["cnt"], r["share"]) for r in heavy_hitters(df, "k", 0.3).collect()}
    assert got == {"a": (5, 0.5), "b": (3, 0.3)}


def test_heavy_hitters_threshold_is_ceil(spark):
    """phi*N landing between integers rounds UP: 11 rows at phi=0.3 ->
    thr=ceil(3.3)=4, so a count of 3 no longer qualifies."""
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"] for r in heavy_hitters(df, "k", 0.3).collect()}
    assert got == {"a"}


def test_heavy_hitters_nulls_excluded(spark):
    """Null keys neither qualify nor count toward N."""
    rows = [("a",), ("a",), (None,), (None,), (None,), ("b",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 0.5).collect()}
    # N = 3 non-null rows, thr = 2
    assert got == {"a": 2}


def test_heavy_hitters_declarative_twin(spark, sf_dir):
    """Partition-layout independence + twin equivalence: the two-pass
    result equals plain groupBy/HAVING on events.user_id, under a
    deliberately different partitioning."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(7)
    phi = 0.01
    n = ev.filter(F.col("user_id").isNotNull()).count()
    thr = math.ceil(phi * n)
    twin = {
        (r["user_id"], r["cnt"])
        for r in ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }
    got = {
        (r["user_id"], r["cnt"])
        for r in heavy_hitters(ev, "user_id", phi).collect()
    }
    assert got == twin and got


def test_candidates_are_a_superset(spark, sf_dir):
    """The map-only candidate pass must contain every true heavy hitter
    regardless of partition layout."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(11)
    phi = 0.01
    n = ev.count()
    true_hh = {
        r["user_id"]
        for r in ev.groupBy("user_id")
        .count()
        .filter(F.col("count") >= math.ceil(phi * n))
        .collect()
    }
    cands = {
        r["user_id"]
        for r in heavy_hitter_candidates(ev, "user_id", phi).distinct().collect()
    }
    assert true_hh <= cands


def test_phi_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        heavy_hitter_candidates(df, "k", 0.0)
