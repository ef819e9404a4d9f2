"""SparkSession factory tuned for this engine.

Defaults target correctness-reproducibility (UTC session timezone, ANSI off
so malformed casts yield NULL like pandas ``to_numeric(errors='coerce')`` —
see reference d2b_data/ProphetForecaster.py:107-110) and scale-readiness
(AQE on, shuffle partitions sized for the cluster, dynamic partition
overwrite for idempotent per-day replaces like d2b_data/Google_Bigquery.py:96-105).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conservative local default; on a real cluster set via spark-submit --conf.
_DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "d2b_dataframework_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Notes on choices:
    - ``spark.sql.session.timeZone=UTC``: the reference normalizes every
      timestamp to UTC (d2b_data/utc_converter.py, facebook_organic.py:369).
    - ``spark.sql.ansi.enabled=false``: reference semantics are
      coerce-to-null (pd.to_numeric(errors='coerce')), not fail-fast.
    - ``spark.sql.adaptive.enabled=true`` + skew join: runtime re-planning
      for the 100TB case.
    - ``partitionOverwriteMode=dynamic``: per-partition idempotent replace
      = the reference's date-sharded "if_exists=replace" loads.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Long-running sessions (streaming drivers, bench loops, notebooks)
        # accumulate broadcast/checkpoint blocks that the ContextCleaner
        # only releases after a driver GC; with a large heap, full GCs are
        # rare, so blocks pile up for the default 30min. A 1min periodic
        # GC keeps block-manager memory flat at negligible CPU cost.
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None):
    """Read the harness parquet tables and register them as temp views.

    Returns a dict name -> DataFrame. Mirrors TESTDATA.md layout.
    """
    names = tables or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
