"""Partitioned sinks (SURVEY §2.2 K1/K2/K5).

The reference's warehouse model is one BigQuery table per day
(``table_YYYYMMDD``) replaced idempotently on re-run
(d2b_data/Google_Bigquery.py:82-106, Linkedin_Marketing.py:84-145). The
Spark-native equivalent is a date-partitioned table with DYNAMIC partition
overwrite: re-running a day replaces exactly that day's partition and
touches nothing else — the per-day loop, slice filter and replace are what
the writer does natively, with no driver-side iteration.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d2b_dataframework_spark.functions.colnames import normalize_columns


def write_date_sharded(
    df: DataFrame,
    path: str,
    date_col: str = "date",
    clean: bool = True,
    fmt: str = "parquet",
) -> None:
    """K1: date-partitioned idempotent write.

    - ``clean=True`` applies BQ-safe column normalization first (P3),
      matching ``Google_Bigquery.upload(clean=True)``.
    - The date partition value is normalized to a YYYY-MM-DD string (the
      reference casts the date column to str before sharding,
      Google_Bigquery.py:87).
    - Requires spark.sql.sources.partitionOverwriteMode=dynamic (set by
      core.session.get_session) so mode("overwrite") replaces only the
      partitions present in ``df``.
    """
    if clean:
        df = normalize_columns(df, "bq")
    df = df.withColumn(date_col, F.date_format(F.col(date_col), "yyyy-MM-dd"))
    (
        df.repartition(F.col(date_col))  # one shuffle → one file set per day
        .write.partitionBy(date_col)
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )


def read_date_sharded(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def upsert_cache(
    spark: SparkSession,
    cache_path: str,
    all_keys: DataFrame,
    fetch_missing,
    key_col: str,
) -> DataFrame:
    """K5: incremental keyed materialization (LinkedIn engagement cache,
    linkedin_organic.py:602-699).

    cached ∪ fetch_missing(all_keys ⟕anti cached) — the reference's manual
    'fetch only URNs not in the JSON cache' as a left-anti join + union +
    rewrite. ``fetch_missing`` takes a DataFrame of missing keys and
    returns rows with the cache schema. Quota-partial results persist
    (R9 graceful degradation): whatever was fetched lands in the cache.
    """
    try:
        cached = spark.read.parquet(cache_path)
        have_cache = True
    except AnalysisException:  # first run: no cache yet; transient I/O
        cached = None          # errors propagate (don't clobber a cache
        have_cache = False     # that exists but failed to read)

    if have_cache:
        missing = all_keys.join(cached.select(key_col), key_col, "left_anti")
    else:
        missing = all_keys
    fetched = fetch_missing(missing)
    merged = cached.unionByName(fetched) if have_cache else fetched
    # Rewrite via a temp dir? For parquet simplicity: materialize then write.
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(cache_path)
    return spark.read.parquet(cache_path)
