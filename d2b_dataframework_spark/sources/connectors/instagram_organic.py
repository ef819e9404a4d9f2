"""Instagram organic media/stories insights source (SURVEY §2.1 S13/S14,
§2.7 F24, §2.11 R6).

Reference semantics (d2b_data/instagram_organic.py):

- ``_get_media``: fetch ``/{ig_account_id}/media`` (cursor pagination,
  clone of the Graph walk, :113-153), then CLIENT-side filter
  ``media_product_type ∈ {FEED, REELS}`` (:155-198, filter :190-192).
- ``_get_stories``: ``/stories`` endpoint, API-enforced 24 h window, no
  date params (:200-222).
- Per-media insights: one call per media id; failures skip metrics but
  keep the row (R6, :256-260); lifetime values flattened with
  first-value fallback (F24, :262-290).
- Default window: since = yesterday−30d, until = yesterday (F8,
  :458-480) → sources.datesplit.default_window.

Spark shape: driver cursor walk → media frame; ``media_product_type``
filter is a Catalyst predicate (it reaches the scan when the source is a
table; against the live API it stays a client filter exactly like the
reference). Insights enrichment fans out on media_id and left-joins back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import LongType, StringType, StructField, StructType

from d2b_dataframework_spark.sources.pagination import cursor_pages
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df
from d2b_dataframework_spark.sources.retry import GOOGLE_POLICY, RetryPolicy

MEDIA_FIELDS = "id,media_type,media_product_type,caption,timestamp,permalink"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("ig_account_id", StringType()),
        StructField("media_type", StringType()),
        StructField("media_product_type", StringType()),
        StructField("caption", StringType()),
        StructField("timestamp", StringType()),
        StructField("permalink", StringType()),
    ]
)


def flatten_media(item: dict, ig_account_id: str) -> dict:
    return {
        "media_id": item.get("id"),
        "ig_account_id": ig_account_id,
        "media_type": item.get("media_type"),
        "media_product_type": item.get("media_product_type"),
        "caption": item.get("caption"),
        "timestamp": item.get("timestamp"),
        "permalink": item.get("permalink"),
    }


def _walk(transport, endpoint: str, params: dict, policy: RetryPolicy):
    def fetch(cursor):
        p = dict(params)
        if cursor:
            p["after"] = cursor
        payload = policy.call(lambda: transport.get(endpoint, p))
        rows = payload.get("data", [])
        nxt = payload.get("paging", {}).get("cursors", {}).get("after")
        if not payload.get("paging", {}).get("next"):
            nxt = None
        return rows, nxt

    for batch in cursor_pages(fetch):
        yield batch


def read_media(
    spark: SparkSession,
    transport,
    ig_account_id: str,
    since: str | None = None,
    until: str | None = None,
    media_product_type: str | None = None,
    policy: RetryPolicy = GOOGLE_POLICY,
) -> DataFrame:
    """S13: media scan + product-type predicate
    (instagram_organic.py:155-198)."""
    params = {"fields": MEDIA_FIELDS}
    if since:
        params["since"] = since
    if until:
        params["until"] = until
    rows = [
        flatten_media(m, ig_account_id)
        for batch in _walk(transport, f"{ig_account_id}/media", params, policy)
        for m in batch
    ]
    df = rows_to_df(spark, rows, MEDIA_SCHEMA)
    if media_product_type:
        df = df.filter(F.col("media_product_type") == media_product_type)
    return df


def read_stories(
    spark: SparkSession,
    transport,
    ig_account_id: str,
    policy: RetryPolicy = GOOGLE_POLICY,
) -> DataFrame:
    """S14: stories scan — separate endpoint, no date params; the 24 h
    availability window is API-enforced (instagram_organic.py:200-222).
    Unions cleanly with the media scan (same schema, product type
    STORY)."""
    rows = [
        {**flatten_media(s, ig_account_id), "media_product_type": "STORY"}
        for batch in _walk(
            transport, f"{ig_account_id}/stories", {"fields": MEDIA_FIELDS}, policy
        )
        for s in batch
    ]
    return rows_to_df(spark, rows, MEDIA_SCHEMA)


def insights_schema(metrics: list[str]) -> StructType:
    return StructType(
        [StructField("media_id", StringType())]
        + [StructField(m, LongType()) for m in metrics]
    )


def read_media_insights(
    spark: SparkSession,
    transport,
    media_ids: list[str],
    metrics: list[str],
) -> DataFrame:
    """Per-media insight fan-out; failures → null metrics, row survives
    (R6, instagram_organic.py:256-260; flatten :262-290)."""
    schema = insights_schema(metrics)

    def fetch_task(task: dict) -> list[dict]:
        mid = task["media_id"]
        try:
            payload = transport.get(
                f"{mid}/insights", {"metric": ",".join(metrics)}
            )
            by_name = {}
            for item in payload.get("data", []):
                values = item.get("values", [])
                val = next(
                    (v.get("value") for v in values if v.get("period") == "lifetime"),
                    None,
                )
                if val is None and values:
                    val = values[0].get("value")
                by_name[item.get("name")] = val
            rec = {
                m: (int(by_name[m]) if by_name.get(m) is not None else None)
                for m in metrics
            }
        except Exception:  # noqa: BLE001 — R6
            rec = dict.fromkeys(metrics)
        return [{"media_id": mid, **rec}]

    tasks = [{"media_id": m} for m in media_ids]
    return fanout_fetch(spark, tasks, fetch_task, schema)


def media_with_insights(media: DataFrame, insights: DataFrame) -> DataFrame:
    """J5 as a join on media_id (replaces per-row dict merge,
    instagram_organic.py:319-335)."""
    return media.join(insights, "media_id", "left")
