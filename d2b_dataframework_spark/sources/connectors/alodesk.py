"""Alodesk leads source (SURVEY §2.1 S25, §2.6 D1, §2.11 R4).

Reference semantics (d2b_data/Alodesk_API.py):

- ``download_leads``: ``api/leads/report/`` with startDate/endDate,
  page-number pagination; responses are EITHER a bare list OR
  ``{results, next}`` (:65-91, :95-122) — dual-shape adapter.
- Dedup keep-latest: sort by ``updated_at`` (parsed with
  ``errors='coerce'`` → invalid timestamps become null) and keep the
  last row per ``lead_id`` (D1, :29-44) → operators.dedup.keep_latest,
  the reference's only window-shaped operation.
- Retry: tenacity, 4 attempts, exp wait (R4, :47-63) →
  retry.TENACITY_POLICY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from d2b_dataframework_spark.operators.dedup import keep_latest
from d2b_dataframework_spark.sources.rest import rows_to_df
from d2b_dataframework_spark.sources.retry import TENACITY_POLICY, RetryPolicy

LEADS_SCHEMA = StructType(
    [
        StructField("lead_id", StringType()),
        StructField("updated_at", StringType()),
        StructField("name", StringType()),
        StructField("status", StringType()),
    ]
)


def adapt_page(payload) -> tuple[list[dict], bool]:
    """Dual response shapes: bare list (no next page) or
    {results, next} (Alodesk_API.py:72-85)."""
    if isinstance(payload, list):
        return payload, False
    return payload.get("results", []), bool(payload.get("next"))


def read_leads(
    spark: SparkSession,
    transport,
    start_date: str,
    end_date: str,
    dedup: bool = True,
    policy: RetryPolicy = TENACITY_POLICY,
) -> DataFrame:
    """S25 scan + D1 dedup-keep-latest.

    ``updated_at`` parses with coerce-to-null semantics
    (``try_to_timestamp`` — ANSI-safe analog of pandas
    ``to_datetime(errors='coerce')`` at Alodesk_API.py:41); null
    timestamps sort first so any valid timestamp wins over an invalid
    one, matching pandas NaT ordering under keep='last'.
    """
    rows: list[dict] = []
    page = 1
    while True:
        payload = policy.call(
            lambda p=page: transport.get(
                "api/leads/report/",
                {"startDate": start_date, "endDate": end_date, "page": p},
            )
        )
        batch, has_next = adapt_page(payload)
        rows.extend(
            {
                "lead_id": str(r.get("id", r.get("lead_id"))),
                "updated_at": r.get("updated_at"),
                "name": r.get("name"),
                "status": r.get("status"),
            }
            for r in batch
        )
        if not has_next:
            break
        page += 1

    df = rows_to_df(spark, rows, LEADS_SCHEMA)
    if not dedup:
        return df
    df = df.withColumn("_ts", F.try_to_timestamp("updated_at"))
    return keep_latest(df, "lead_id", "_ts", tiebreakers=["updated_at"]).drop("_ts")
