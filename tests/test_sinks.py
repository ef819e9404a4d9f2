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


import pytest

# file-layout/overwrite semantics — ANSI-independent
pytestmark = pytest.mark.single_leg

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


def test_bucketed_join_elides_exchanges(spark, tmp_path):
    from d2b_dataframework_spark.sinks.bucketed import bucketed_join, write_bucketed

    left = spark.range(1000).selectExpr("id as k", "id * 2 as a")
    right = spark.range(1000).selectExpr("id as k", "id * 3 as b")
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    write_bucketed(left, "bt_left", "k", buckets=4)
    write_bucketed(right, "bt_right", "k", buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bt_left", "bt_right", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket co-location: no shuffle at all
        assert joined.count() == 1000
        row = joined.filter("k = 7").collect()[0]
        assert (row["a"], row["b"]) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")


def test_date_sharded_read_prunes_partitions(spark, tmp_path):
    """A day-filtered read of the K1 sink must touch only that day's
    partition: the filter appears as a PartitionFilter on the scan, not
    a post-scan Filter over all files."""
    path = str(tmp_path / "pruned")
    write_date_sharded(
        _days_df(spark, [("2024-01-0%d" % d, d) for d in range(1, 6)]), path
    )
    scan = spark.read.parquet(path).filter(F.col("date") == "2024-01-03")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan
    assert scan.count() == 1


def test_compact_date_partitions_merges_small_files(spark, tmp_path):
    from d2b_dataframework_spark.sinks.partitioned import (
        compact_date_partitions,
        list_partition_files,
        write_date_sharded,
    )

    path = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 2 == 0, "2024-01-01").otherwise("2024-01-02").alias("date"),
        F.col("id").alias("v"),
    )
    # fragment: 8 files per partition
    df.repartition(8).write.partitionBy("date").mode("overwrite").parquet(path)
    before = list_partition_files(spark, path)
    assert all(n >= 8 for n, _ in before.values())

    plan = compact_date_partitions(spark, path, target_bytes=1 << 30)
    assert set(plan) == {"2024-01-01", "2024-01-02"}
    after = list_partition_files(spark, path)
    assert all(n == 1 for n, _ in after.values())
    # data intact
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.agg(F.sum("v")).collect()[0][0] == sum(range(1000))
    # idempotent: nothing left to compact
    assert compact_date_partitions(spark, path, target_bytes=1 << 30) == {}


def test_write_with_audit_computes_metrics_in_one_job(spark, tmp_path):
    from d2b_dataframework_spark.operators.observe import write_with_audit

    df = spark.range(0, 500).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("k"),
    )
    path = str(tmp_path / "audited")
    audit = write_with_audit(
        df,
        path,
        {
            "n_rows": F.count(F.lit(1)),
            "null_keys": F.sum(F.col("k").isNull().cast("long")),
            "max_id": F.max("id"),
        },
    )
    assert audit == {"n_rows": 500, "null_keys": 100, "max_id": 499}
    assert spark.read.parquet(path).count() == 500


def test_merge_schema_read_across_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.range(0, 10).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(
        f"{path}/batch=1"
    )
    spark.range(10, 20).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.parquet(f"{path}/batch=2")
    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"id", "v1", "v2", "batch"}
    rows = got.filter(F.col("batch") == 1).select("v2").distinct().collect()
    assert rows == [__import__("pyspark").sql.Row(v2=None)]  # old files read nulls
    assert got.count() == 20


def test_delete_keys_rewrites_only_affected_partitions(spark, tmp_path):
    from d2b_dataframework_spark.sinks.partitioned import (
        delete_keys_from_partitions,
        list_partition_files,
    )

    path = str(tmp_path / "erasure")
    df = spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"),
         ("2024-01-02", 1, "c"), ("2024-01-03", 3, "d")],
        "date string, user_id long, payload string",
    )
    df.repartition(1).write.partitionBy("date").parquet(path)
    before = list_partition_files(spark, path)

    keys = spark.createDataFrame([(1,)], "user_id long")
    removed = delete_keys_from_partitions(spark, path, keys, "user_id")
    assert removed == {"2024-01-01": 1, "2024-01-02": 1}

    got = spark.read.parquet(path)
    assert {r["user_id"] for r in got.collect()} == {2, 3}
    # the untouched partition kept its original file set
    after = list_partition_files(spark, path)
    assert after["2024-01-03"] == before["2024-01-03"]
    # idempotent: nothing left to remove
    assert delete_keys_from_partitions(spark, path, keys, "user_id") == {}


def test_date_sharded_overwrite_safe_on_static_mode_session(spark, tmp_path):
    """ADVICE r2: on a session with the Spark DEFAULT (static)
    partitionOverwriteMode, a per-day rewrite used to delete every
    other partition. The writer now forces dynamic mode per write, so
    untouched days must survive regardless of session conf."""
    path = str(tmp_path / "shard_static")
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "date string, v long"
    )
    write_date_sharded(df, path, clean=False)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        day2 = spark.createDataFrame([("2024-01-02", 99)], "date string, v long")
        write_date_sharded(day2, path, clean=False)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {
        (str(r["date"]), r["v"]) for r in read_date_sharded(spark, path).collect()
    }
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}


def test_export_jsonl_shards_roundtrip_and_manifest(spark, tmp_path):
    from d2b_dataframework_spark.sinks.export import export_jsonl_shards, read_jsonl_shards

    path = str(tmp_path / "corpus")
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text-"), F.col("id")).alias("text")
    )
    manifest = export_jsonl_shards(df, path, n_shards=4)
    assert manifest["n_rows"] == 200
    assert sum(s["rows"] for s in manifest["shards"].values()) == 200
    assert all(s["bytes"] > 0 for s in manifest["shards"].values() if s["rows"])
    back = read_jsonl_shards(spark, path)
    assert back.count() == 200
    assert {r["doc_id"] for r in back.collect()} == set(range(200))


def test_export_shard_membership_is_layout_invariant(spark, tmp_path):
    from d2b_dataframework_spark.sinks.export import export_jsonl_shards

    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    m1 = export_jsonl_shards(df, str(tmp_path / "a"), n_shards=4)
    m2 = export_jsonl_shards(
        df.repartition(13).sortWithinPartitions(F.col("doc_id").desc()),
        str(tmp_path / "b"),
        n_shards=4,
    )
    assert {k: v["rows"] for k, v in m1["shards"].items()} == {
        k: v["rows"] for k, v in m2["shards"].items()
    }


def test_read_jsonl_shards_detects_truncation(spark, tmp_path):
    import glob
    import os

    from d2b_dataframework_spark.sinks.export import export_jsonl_shards, read_jsonl_shards

    path = str(tmp_path / "corpus2")
    df = spark.range(0, 50).select(F.col("doc_id" if False else "id").alias("doc_id"))
    export_jsonl_shards(df, path, n_shards=2)
    # simulate a lost shard file
    victim = glob.glob(f"{path}/shard=0/*.json")[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="manifest says"):
        read_jsonl_shards(spark, path)
