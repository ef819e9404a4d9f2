"""Sink tests: date-sharded dynamic partition overwrite (K1/K2),
incremental keyed cache (K5), retention vacuum."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from d2b_dataframework_spark.sinks.partitioned import (
    read_date_sharded,
    upsert_cache,
    write_date_sharded,
)
from d2b_dataframework_spark.sources.connectors.warehouse import vacuum_expired


def _days_df(spark, rows):
    return spark.createDataFrame(rows, "date string, v long").withColumn(
        "date", F.to_date("date")
    )


def test_date_sharded_idempotent_replace(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_date_sharded(_days_df(spark, [("2024-01-01", 1), ("2024-01-02", 2)]), path)
    # Re-run day 2 with different data: replaces ONLY day 2.
    write_date_sharded(_days_df(spark, [("2024-01-02", 99)]), path)
    out = {str(r["date"]): r["v"] for r in read_date_sharded(spark, path).collect()}
    assert out == {"2024-01-01": 1, "2024-01-02": 99}


def test_date_sharded_clean_applies_colname_normalization(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("2024-01-01", 5)], "`date` string, `Ad Spend&Fees` long"
    ).withColumn("date", F.to_date("date"))
    write_date_sharded(df, path, clean=True)
    cols = set(read_date_sharded(spark, path).columns)
    assert "ad_spend_fees" in cols  # P3: lower, space→_, &→_


def test_upsert_cache_fetches_only_missing(spark, tmp_path):
    cache = str(tmp_path / "cache")
    fetched: list[list[str]] = []

    def fetch_missing(missing_df):
        keys = sorted(r["k"] for r in missing_df.collect())
        fetched.append(keys)
        return spark.createDataFrame([(k, f"val_{k}") for k in keys] or [], "k string, v string")

    keys1 = spark.createDataFrame([("a",), ("b",)], "k string")
    out1 = upsert_cache(spark, cache, keys1, fetch_missing, "k")
    assert {r["k"] for r in out1.collect()} == {"a", "b"}
    assert fetched == [["a", "b"]]

    keys2 = spark.createDataFrame([("a",), ("c",)], "k string")
    out2 = upsert_cache(spark, cache, keys2, fetch_missing, "k")
    assert {r["k"] for r in out2.collect()} == {"a", "b", "c"}
    assert fetched == [["a", "b"], ["c"]]  # only the delta was fetched


def test_vacuum_expired_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_date_sharded(
        _days_df(spark, [("2020-01-01", 1), ("2024-01-02", 2)]), path
    )
    removed = vacuum_expired(path, today=date(2024, 6, 1), retention_days=1096)
    assert removed == ["date=2020-01-01"]
    remaining = {str(r["date"]) for r in read_date_sharded(spark, path).collect()}
    assert remaining == {"2024-01-02"}
