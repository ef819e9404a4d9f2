"""Warehouse SQL scan + date-sharded upload (SURVEY §2.1 S1, §2.2 K1/K2).

Reference semantics:

- ``Google_Bigquery._get_data(query, project_id)`` runs Standard SQL and
  returns a DataFrame (d2b_data/Google_Bigquery.py:29-51).
- ``Google_Bigquery.upload`` cleans column names (P3), casts the date
  column to string, and writes one table per distinct date
  (``destination_YYYYMMDD``) with ``if_exists="replace"``
  (Google_Bigquery.py:82-106).
- ``Linkedin_Marketing.upload_to_bigquery_by_day`` adds explicit schema,
  per-day error isolation and a 1096-day shard expiry
  (Linkedin_Marketing.py:84-145).

Spark shape: the SQL scan is ``spark.sql`` over registered tables (on a
cluster this is the BigQuery/JDBC DataSource with query pushdown — the
engine contract is "SQL string in, DataFrame out"); the per-day sharded
replace is DYNAMIC partition overwrite, which replaces exactly the
partitions present in the incoming frame in one distributed write — no
driver loop, no per-day slice scans. Retention (shard expiry) becomes
partition vacuuming by date.
"""

from __future__ import annotations

import shutil
from datetime import date, timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from d2b_dataframework_spark.sinks.partitioned import write_date_sharded

RETENTION_DAYS = 1096  # Linkedin_Marketing.py:137


def sql_scan(spark: SparkSession, query: str) -> DataFrame:
    """S1: Standard-SQL scan → DataFrame (Google_Bigquery.py:29-51).

    Locally this resolves against registered temp views / catalog tables;
    on a cluster the same call site swaps in the BigQuery connector's
    query pushdown. Catalyst handles predicate pushdown and pruning for
    whatever the FROM resolves to.
    """
    return spark.sql(query)


def upload(
    df: DataFrame,
    path: str,
    date_col: str = "date",
    clean: bool = True,
) -> None:
    """K1: idempotent per-day replace via dynamic partition overwrite
    (Google_Bigquery.py:82-106 without the driver loop)."""
    write_date_sharded(df, path, date_col=date_col, clean=clean)


def vacuum_expired(path: str, today: date, retention_days: int = RETENTION_DAYS) -> list[str]:
    """K2 retention: drop date partitions older than ``retention_days``
    (the per-shard expiry at Linkedin_Marketing.py:135-138). Returns the
    removed partition directory names."""
    floor = (today - timedelta(days=retention_days)).isoformat()
    removed = []
    root = Path(path)
    if not root.exists():
        return removed
    for part in sorted(root.glob("*=*")):
        value = part.name.split("=", 1)[1]
        if value < floor:
            shutil.rmtree(part)
            removed.append(part.name)
    return removed
