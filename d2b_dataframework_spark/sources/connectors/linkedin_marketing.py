"""LinkedIn Ads (Marketing) source (SURVEY §2.1 + §2.4 J6, §2.3 P5, §2.7
F21, §2.2 K2).

Reference semantics (d2b_data/Linkedin_Marketing.py):

- Analytics report fetch per 1-day window when unsampled mode is on
  (:62-66) — the generic window splitter with max_days=1.
- ``pd.json_normalize`` flatten + regex column cleanup (P5, :72,80) →
  functions.colnames.normalize_columns("regex").
- ``adentities`` nested lists JSON-stringified (F21, :78) → F.to_json.
- Campaign/group id → name lookups via batch GET returned as dict maps
  (J6, :147-221) → broadcast map join.
- ``upload_to_bigquery_by_day``: per-day replace with explicit schema and
  1096-day expiry; one day's failure logs and continues (K2/R7,
  :84-145) → sinks.partitioned + connectors.warehouse.vacuum_expired;
  per-day error isolation is Spark task retry + dynamic overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from d2b_dataframework_spark.sources.datesplit import split_range
from d2b_dataframework_spark.sources.rest import fanout_fetch
from d2b_dataframework_spark.sources.retry import LINKEDIN_POLICY, RetryPolicy

REPORT_SCHEMA = StructType(
    [
        StructField("date", StringType()),
        StructField("campaign_id", StringType()),
        StructField("impressions", StringType()),
        StructField("clicks", StringType()),
        StructField("cost", StringType()),
        StructField("adentities", StringType()),  # F21: JSON-stringified
    ]
)


def flatten_row(row: dict, day: str) -> dict:
    import json

    return {
        "date": day,
        "campaign_id": str(row.get("campaign_id", row.get("pivotValues", [""])[0] if row.get("pivotValues") else "")),
        "impressions": str(row.get("impressions", "0")),
        "clicks": str(row.get("clicks", "0")),
        "cost": str(row.get("costInLocalCurrency", row.get("cost", "0"))),
        "adentities": json.dumps(row.get("adentities", [])),
    }


def read_report(
    spark: SparkSession,
    transport,
    account_id: str,
    start_date: str,
    end_date: str,
    unsampled: bool = True,
    policy: RetryPolicy = LINKEDIN_POLICY,
) -> DataFrame:
    """Per-day fan-out analytics scan (unsampled mode forces 1-day
    windows, Linkedin_Marketing.py:62-66)."""
    windows = split_range(start_date, end_date, max_days=1 if unsampled else 30)

    def fetch_task(task: dict) -> list[dict]:
        payload = policy.call(
            lambda: transport.get(
                "adAnalytics",
                {
                    "q": "analytics",
                    "account": account_id,
                    "dateRange.start": task["start"],
                    "dateRange.end": task["end"],
                },
            )
        )
        return [flatten_row(r, task["start"]) for r in payload.get("elements", [])]

    tasks = [{"start": s, "end": e} for s, e in windows]
    return fanout_fetch(spark, tasks, fetch_task, REPORT_SCHEMA)


def fetch_name_map(transport, ids: list[str], endpoint: str = "adCampaigns",
                   policy: RetryPolicy = LINKEDIN_POLICY) -> dict[str, str]:
    """J6 source half: batch GET ids → {id: name}
    (Linkedin_Marketing.py:147-221)."""
    if not ids:
        return {}
    payload = policy.call(
        lambda: transport.get(endpoint, {"ids": ",".join(sorted(ids))})
    )
    return {
        str(k): v.get("name", "") for k, v in payload.get("results", {}).items()
    }


def with_names(
    spark: SparkSession, df: DataFrame, name_map: dict[str, str],
    id_col: str = "campaign_id", name_col: str = "campaign_name",
) -> DataFrame:
    """J6 join half: broadcast the id→name dim and left-join — Catalyst
    picks BroadcastHashJoin, no shuffle of the fact side."""
    dim = spark.createDataFrame(
        [(k, v) for k, v in name_map.items()] or [(None, None)],
        f"{id_col} string, {name_col} string",
    ).filter(F.col(id_col).isNotNull())
    return df.join(F.broadcast(dim), id_col, "left")
