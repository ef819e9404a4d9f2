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
    - Dynamic partition overwrite is forced PER WRITE via the writer
      option, so mode("overwrite") replaces only the partitions present
      in ``df`` on ANY session — not just ones built by
      core.session.get_session. (Under the Spark default *static* mode
      this write would silently delete every other partition.)
    """
    if clean:
        df = normalize_columns(df, "bq")
    df = df.withColumn(date_col, F.date_format(F.col(date_col), "yyyy-MM-dd"))
    (
        df.repartition(F.col(date_col))  # one shuffle → one file set per day
        .write.partitionBy(date_col)
        .option("partitionOverwriteMode", "dynamic")
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


def list_partition_files(
    spark: SparkSession, path: str, date_col: str = "date"
) -> dict[str, tuple[int, int]]:
    """Per-partition (file_count, total_bytes) via the Hadoop FileSystem
    API — scheme-agnostic (file://, hdfs://, s3a://), metadata-only
    (O(#files) driver-side listing, no data read)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    out: dict[str, tuple[int, int]] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(f"{date_col}="):
            files = [
                f
                for f in fs.listStatus(st.getPath())
                if f.isFile() and not f.getPath().getName().startswith(("_", "."))
            ]
            out[name.split("=", 1)[1]] = (
                len(files),
                sum(f.getLen() for f in files),
            )
    return out


def compact_date_partitions(
    spark: SparkSession,
    path: str,
    date_col: str = "date",
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> dict[str, tuple[int, int]]:
    """Small-file compaction for a date-partitioned table.

    Streaming appends and per-day incremental loads fragment partitions
    into many tiny files; at 100TB the scan cost becomes footer-reads
    and task-scheduling overhead instead of I/O (the classic small-file
    problem). This rewrites ONLY over-fragmented partitions — those with
    more files than ``ceil(bytes / target_bytes)`` — down to that file
    count, via dynamic partition overwrite (untouched days keep their
    files; re-runs are idempotent).

    The date loop is driver-side but METADATA-scale: it iterates over
    fragmented *partitions* (bounded by the retention window, e.g. 1096
    days for K2), never rows. Each rewrite is one distributed job
    reading exactly one partition (partition-pruned scan).

    Returns {date: (files_before, files_target)} for the rewritten
    partitions.
    """
    parts = list_partition_files(spark, path, date_col)
    plan: dict[str, tuple[int, int]] = {}
    for date, (n_files, n_bytes) in parts.items():
        want = max(1, -(-n_bytes // target_bytes))  # ceil div
        if n_files > want:
            plan[date] = (n_files, want)
    for date, (_, want) in plan.items():
        (
            spark.read.format(fmt)
            .load(path)
            .filter(F.col(date_col) == date)  # partition-pruned scan
            .repartition(want)
            .write.partitionBy(date_col)
            # per-write dynamic overwrite: on a session with the Spark
            # default (static) mode this rewrite would otherwise DELETE
            # every other date partition of the table
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")  # dynamic: replaces only this date
            .format(fmt)
            .save(path)
        )
    return plan


def delete_keys_from_partitions(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str,
    date_col: str = "date",
    fmt: str = "parquet",
) -> dict[str, int]:
    """Right-to-erasure delete: remove every row whose ``key_col`` is in
    ``keys`` from a date-partitioned table, rewriting ONLY partitions
    that actually contain those keys.

    Two passes: (1) a pruned scan finds the affected dates (semi-join
    against the broadcast key set; output is metadata-sized); (2) each
    affected date is re-read partition-pruned, anti-joined, and replaced
    via dynamic overwrite — untouched days keep their files byte-for-
    byte, so the erasure run is proportional to the keys' footprint,
    not the table size. Returns {date: rows_removed}.
    """
    table = spark.read.format(fmt).load(path)
    kdf = keys.select(F.col(key_col)).distinct()
    affected = {
        str(r["d"]): r["n"]
        for r in table.join(F.broadcast(kdf), key_col, "left_semi")
        .groupBy(F.col(date_col).cast("string").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for date in affected:
        kept = (
            spark.read.format(fmt)
            .load(path)
            .filter(F.col(date_col) == date)  # partition-pruned scan
            .join(F.broadcast(kdf), key_col, "left_anti")
            .localCheckpoint(eager=True)  # sever self-overwrite lineage
        )
        if kept.isEmpty():
            # dynamic overwrite only replaces partitions PRESENT in the
            # written data — a fully-erased day must be dropped at the
            # filesystem level
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            part = jvm.org.apache.hadoop.fs.Path(f"{path}/{date_col}={date}")
            part.getFileSystem(conf).delete(part, True)
        else:
            (
                kept.write.partitionBy(date_col)
                # per-write dynamic overwrite — a static-mode session
                # would otherwise wipe all non-affected dates
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")  # dynamic: replaces only this date
                .format(fmt)
                .save(path)
            )
    return affected
