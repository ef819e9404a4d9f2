"""Facebook Page organic posts + insights source (SURVEY §2.1 S10–S12,
§2.7 F16/F17, §2.11 R6).

Reference semantics (d2b_data/facebook_organic.py):

- ``get_posts``: ``/{page_id}/posts`` with a fields list including
  ``shares``, ``comments.summary(true)``, ``reactions.summary(true)``
  (:36), cursor pagination following ``paging.cursors.after`` until no
  ``next`` or an empty page (:113-154).
- Normalization (F17): ``shares {count}`` → count, ``comments.summary.
  total_count`` → count, absent → 0 (:227-246); reactions-by-type dict
  expands to ``reactions_{type}`` columns (F16, :187-190).
- ``get_post_insights``: one ``/{post_id}/insights?period=lifetime`` call
  per post; a failed fetch returns ``{}`` and the row SURVIVES with null
  metrics (R6, :251-284); the lifetime-period value is taken per metric
  with first-value fallback (F24, :156-194).
- Date params accept ``YYYY-MM-DD`` or ``YYYYMMDD`` (F5, :303-333).

Spark shape: the cursor walk is inherently serial (risk §7.5.1) and
stays on the driver yielding row batches; per-post insight enrichment is
the distributed part — post ids fan out via mapInPandas in batches, and
the resulting metrics table left-joins back on ``post_id`` (J5 as a real
join instead of per-row dict merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from d2b_dataframework_spark.sources.pagination import cursor_pages
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df
from d2b_dataframework_spark.sources.retry import GOOGLE_POLICY, RetryPolicy

POST_FIELDS = (
    "id,message,created_time,shares,comments.summary(true),reactions.summary(true)"
)  # facebook_organic.py:36

POSTS_SCHEMA = StructType(
    [
        StructField("post_id", StringType()),
        StructField("page_id", StringType()),
        StructField("message", StringType()),
        StructField("created_time", StringType()),
        StructField("shares", LongType()),
        StructField("comments", LongType()),
        StructField("reactions", LongType()),
    ]
)


def flatten_post(post: dict, page_id: str) -> dict:
    """F17 normalization: nested summaries → counts, absent → 0
    (facebook_organic.py:227-246)."""
    return {
        "post_id": post.get("id"),
        "page_id": page_id,
        "message": post.get("message"),
        "created_time": post.get("created_time"),
        "shares": int(post.get("shares", {}).get("count", 0)),
        "comments": int(
            post.get("comments", {}).get("summary", {}).get("total_count", 0)
        ),
        "reactions": int(
            post.get("reactions", {}).get("summary", {}).get("total_count", 0)
        ),
    }


def iter_posts(
    transport,
    page_id: str,
    since: str | None = None,
    until: str | None = None,
    policy: RetryPolicy = GOOGLE_POLICY,
):
    """S10+S11: cursor-paginated ``/{page_id}/posts`` walk
    (facebook_organic.py:113-154, 200-249)."""

    def fetch(cursor):
        params = {"fields": POST_FIELDS}
        if since:
            params["since"] = since
        if until:
            params["until"] = until
        if cursor:
            params["after"] = cursor
        payload = policy.call(lambda: transport.get(f"{page_id}/posts", params))
        rows = payload.get("data", [])
        nxt = payload.get("paging", {}).get("cursors", {}).get("after")
        if not payload.get("paging", {}).get("next"):
            nxt = None
        return rows, nxt

    for batch in cursor_pages(fetch):
        yield [flatten_post(p, page_id) for p in batch]


def read_posts(
    spark: SparkSession,
    transport,
    page_id: str,
    since: str | None = None,
    until: str | None = None,
    policy: RetryPolicy = GOOGLE_POLICY,
) -> DataFrame:
    rows: list[dict] = []
    for batch in iter_posts(transport, page_id, since, until, policy):
        rows.extend(batch)
    return rows_to_df(spark, rows, POSTS_SCHEMA)


def insights_schema(metrics: list[str]) -> StructType:
    return StructType(
        [StructField("post_id", StringType())]
        + [StructField(m, LongType()) for m in metrics]
    )


def flatten_insights(payload: dict, metrics: list[str]) -> dict:
    """F24: per metric take the lifetime-period value (first value
    fallback), absent → None (facebook_organic.py:156-194)."""
    by_name: dict = {}
    for item in payload.get("data", []):
        values = item.get("values", [])
        lifetime = next(
            (v.get("value") for v in values if v.get("period") == "lifetime"), None
        )
        if lifetime is None and values:
            lifetime = values[0].get("value")
        by_name[item.get("name")] = lifetime
    return {m: (int(by_name[m]) if by_name.get(m) is not None else None) for m in metrics}


def read_post_insights(
    spark: SparkSession,
    transport,
    post_ids: list[str],
    metrics: list[str],
    batch_size: int = 50,
) -> DataFrame:
    """S12 distributed: post-id fan-out; a failed per-post fetch yields
    null metrics and the row survives (R6, facebook_organic.py:280-284)."""
    schema = insights_schema(metrics)

    def fetch_task(task: dict) -> list[dict]:
        pid = task["post_id"]
        try:
            payload = transport.get(
                f"{pid}/insights", {"metric": ",".join(metrics), "period": "lifetime"}
            )
            rec = flatten_insights(payload, metrics)
        except Exception:  # noqa: BLE001 — R6 tolerated per-row failure
            rec = dict.fromkeys(metrics)
        return [{"post_id": pid, **rec}]

    tasks = [{"post_id": p} for p in post_ids]
    return fanout_fetch(
        spark, tasks, fetch_task, schema,
        num_partitions=max(1, len(tasks) // batch_size),
    )


def posts_with_insights(
    posts: DataFrame, insights: DataFrame, fill_zero: bool = False
) -> DataFrame:
    """J5 as a real join: enrich posts with their insight metrics on
    ``post_id`` (replaces the per-row ``{**post, **insights}`` merge at
    facebook_organic.py:349-366)."""
    out = posts.join(insights, "post_id", "left")
    if fill_zero:
        metric_cols = [c for c in insights.columns if c != "post_id"]
        out = out.withColumns(
            {c: F.coalesce(F.col(c), F.lit(0)).cast("long") for c in metric_cols}
        )
    return out


def expand_reactions(df: DataFrame, reactions_map: str, types: list[str]) -> DataFrame:
    """F16: reactions-by-type map → ``reactions_{type}`` columns, absent
    → 0 (facebook_organic.py:187-190)."""
    return df.withColumns(
        {
            f"reactions_{t}": F.coalesce(
                F.col(reactions_map).getItem(t).cast("long"), F.lit(0)
            )
            for t in types
        }
    )
