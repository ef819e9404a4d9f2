"""X (Twitter) Ads stats source (SURVEY §2.1 S20/S21, §2.4 J3, §2.7
F10/F22, §2.3 P7).

Reference semantics (d2b_data/X_ads.py):

- ``get_report``: triple loop metric_group × day × campaign, ONE request
  each, fixed ≥1 s spacing (:196-242) — a rate-limited task grid.
- Each response's ``id_data`` metric arrays are normalized and exploded
  (F22, :276-293); null metrics → 0 (F10, :281,297).
- ``summary_account``: campaigns dim table (:177-194) left-joined onto
  metrics on ``entity_ids == id`` (J3, :304-308) — broadcast join.
- Column scrub (P7): drop ``. / | ,`` chars, strip ``request_params_``
  prefix (:323-333) → functions.colnames.

Spark shape: the (metric_group, day, campaign) grid IS the task table —
fan-out with a per-task token-bucket delay replaces serial sleeps; at
1000 executors the wall-clock collapses from hours to the per-executor
rate limit.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import LongType, StringType, StructField, StructType

from d2b_dataframework_spark.operators.joins import broadcast_dim_join
from d2b_dataframework_spark.sources.datesplit import split_range
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df

STATS_SCHEMA = StructType(
    [
        StructField("entity_ids", StringType()),
        StructField("metric_groups", StringType()),
        StructField("start_time", StringType()),
        StructField("placement", StringType()),
        StructField("metrics_engagements", LongType()),
        StructField("metrics_impressions", LongType()),
    ]
)

SUMMARY_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("created_at", StringType()),
        StructField("currency", StringType()),
        StructField("account_id", StringType()),
    ]
)


def flatten_stats(payload: dict, metric_group: str, day: str) -> list[dict]:
    """F22+F10: explode id_data metric arrays; missing metric → 0
    (X_ads.py:276-293)."""
    out = []
    for ent in payload.get("data", []):
        for id_data in ent.get("id_data", []):
            metrics = id_data.get("metrics") or {}

            def total(name):
                vals = metrics.get(name) or []
                return sum(v or 0 for v in vals) if isinstance(vals, list) else int(vals)

            out.append(
                {
                    "entity_ids": ent.get("id"),
                    "metric_groups": metric_group,
                    "start_time": day,
                    "placement": id_data.get("placement"),
                    "metrics_engagements": total("engagements"),
                    "metrics_impressions": total("impressions"),
                }
            )
    return out


def read_stats(
    spark: SparkSession,
    transport,
    account_id: str,
    campaign_ids: list[str],
    metric_groups: list[str],
    start_date: str,
    end_date: str,
    delay_in_seconds: float = 0.0,
) -> DataFrame:
    """S20: the metric_group × day × campaign grid as a fan-out task
    table with per-task rate limiting (X_ads.py:196-242)."""
    days = [d for d, _ in split_range(start_date, end_date, max_days=1)]
    tasks = [
        {"metric_group": g, "day": d, "campaign_id": c}
        for g in metric_groups
        for d in days
        for c in campaign_ids
    ]

    def fetch_task(task: dict) -> list[dict]:
        if delay_in_seconds:
            time.sleep(delay_in_seconds)  # token-bucket stand-in, per task
        payload = transport.get(
            f"stats/accounts/{account_id}",
            {
                "entity": "CAMPAIGN",
                "entity_ids": task["campaign_id"],
                "metric_groups": task["metric_group"],
                "start_time": task["day"],
                "granularity": "DAY",
            },
        )
        return flatten_stats(payload, task["metric_group"], task["day"])

    return fanout_fetch(spark, tasks, fetch_task, STATS_SCHEMA)


def read_account_summary(
    spark: SparkSession, transport, account_id: str
) -> DataFrame:
    """S21: campaigns dim table (X_ads.py:177-194)."""
    payload = transport.get(f"accounts/{account_id}/campaigns", None)
    rows = [
        {
            "id": c.get("id"),
            "name": c.get("name"),
            "created_at": c.get("created_at"),
            "currency": c.get("currency"),
            "account_id": account_id,
        }
        for c in payload.get("data", [])
    ]
    return rows_to_df(spark, rows, SUMMARY_SCHEMA)


def stats_with_summary(stats: DataFrame, summary: DataFrame) -> DataFrame:
    """J3: metrics ⟕ broadcast(campaign summary) on entity_ids == id
    (X_ads.py:304-308)."""
    return broadcast_dim_join(
        stats, summary, stats.entity_ids == summary.id, "left"
    ).withColumns(
        {
            "metrics_engagements": F.coalesce("metrics_engagements", F.lit(0)).cast("long"),
            "metrics_impressions": F.coalesce("metrics_impressions", F.lit(0)).cast("long"),
        }
    )
