"""LinkedIn organic posts + engagement source (SURVEY §2.1 S15–S17, §2.4
J1, §2.2 K5, §2.7 F3/F4/F18, §2.11 R2/R9).

Reference semantics (d2b_data/linkedin_organic.py):

- ``_get_managed_pages_raw``: ``organizationAcls?q=roleAssignee`` → small
  orgs dim table (:181-203).
- ``_fetch_paginated_posts``: page size 50, newest-first; STOP paging at
  the first post older than ``start_date`` (:233-319, early stop
  :299-311) → pagination.early_stop_pages.
- Post flatten: URN → id (F3, :393,426), epoch-ms ``createdAt`` → UTC
  'YYYY-MM-DD HH:MM:SS' (F4, :297,479-485), content-type CASE over
  present keys (F18, :487-497).
- ``_get_engagement_raw``: one ``/socialActions/{urn}`` GET per post (the
  batch endpoint is broken per the comment at :344-346); HTTP 429 raises
  QuotaExhaustedError — daily quota, retry pointless (R2, :153-158).
- Posts ⟕ engagement on ``post_urn``; null counters → 0 → long (J1+F10,
  :589-592). Quota exhaustion mid-enrichment degrades gracefully: posts
  return without engagement columns (R9, :577-587).
- ``get_posts_with_engagement_safe``: disk cache keyed by URN, fetch only
  missing keys, union, persist (K5, :602-699) → sinks.partitioned.
  upsert_cache (left_anti delta fetch).

Spark shape: org/post walks stay driver-side (early-stop is a serial
scan contract); engagement enrichment fans out over URNs with the
LinkedIn retry policy; the join + null-fill is operators.joins.
left_join_fill_zero.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql.types import LongType, StringType, StructField, StructType

from d2b_dataframework_spark.core.errors import QuotaExhaustedError
from d2b_dataframework_spark.operators.joins import left_join_fill_zero
from d2b_dataframework_spark.sources.pagination import early_stop_pages
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df
from d2b_dataframework_spark.sources.retry import LINKEDIN_POLICY, RetryPolicy

PAGE_SIZE = 50  # linkedin_organic.py:263

ORGS_SCHEMA = StructType(
    [
        StructField("organization_urn", StringType()),
        StructField("organization_id", StringType()),
        StructField("role", StringType()),
        StructField("state", StringType()),
    ]
)

POSTS_SCHEMA = StructType(
    [
        StructField("post_urn", StringType()),
        StructField("created_at", StringType()),  # 'YYYY-MM-DD HH:MM:SS' UTC
        StructField("commentary", StringType()),
        StructField("content_type", StringType()),
        StructField("visibility", StringType()),
        StructField("lifecycle_state", StringType()),
    ]
)

ENGAGEMENT_SCHEMA = StructType(
    [
        StructField("post_urn", StringType()),
        StructField("likes", LongType()),
        StructField("comments", LongType()),
        StructField("shares", LongType()),
    ]
)


def urn_tail(urn: str) -> str:
    """F3 driver-side: 'urn:li:organization:123' → '123'
    (linkedin_organic.py:393,426). Column-side twin:
    functions.strings.urn_id."""
    return urn.rsplit(":", 1)[-1]


def epoch_ms_to_str(ms: int) -> str:
    """F4 driver-side: epoch-ms → 'YYYY-MM-DD HH:MM:SS' UTC
    (linkedin_organic.py:297,479-485)."""
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def derive_content_type(content: dict | None) -> str:
    """F18: CASE over present keys (linkedin_organic.py:487-497)."""
    content = content or {}
    if "article" in content:
        return "ARTICLE"
    if "media" in content:
        return "MEDIA"
    if "multiImage" in content:
        return "MULTI_IMAGE"
    return "NONE"


def read_managed_orgs(
    spark: SparkSession,
    transport,
    role: str | None = None,
    policy: RetryPolicy = LINKEDIN_POLICY,
) -> DataFrame:
    """S15: organizationAcls scan → broadcastable dim
    (linkedin_organic.py:181-203)."""
    params = {"q": "roleAssignee"}
    if role:
        params["role"] = role
    payload = policy.call(lambda: transport.get("organizationAcls", params))
    rows = [
        {
            "organization_urn": e.get("organization"),
            "organization_id": urn_tail(e.get("organization", "")),
            "role": e.get("role"),
            "state": e.get("state"),
        }
        for e in payload.get("elements", [])
    ]
    return rows_to_df(spark, rows, ORGS_SCHEMA)


def flatten_post(post: dict) -> dict:
    return {
        "post_urn": post.get("id"),
        "created_at": epoch_ms_to_str(post.get("createdAt", 0)),
        "commentary": post.get("commentary"),
        "content_type": derive_content_type(post.get("content")),
        "visibility": post.get("visibility"),
        "lifecycle_state": post.get("lifecycleState"),
    }


def read_posts(
    spark: SparkSession,
    transport,
    org_urn: str,
    start_date: str,
    end_date: str,
    page_size: int = PAGE_SIZE,
    policy: RetryPolicy = LINKEDIN_POLICY,
) -> DataFrame:
    """S16: newest-first early-stop scan (linkedin_organic.py:233-319).

    The date predicate is pushed into the source iterator — paging stops
    entirely at the first post older than ``start_date`` (the API returns
    newest-first), the source-side analog of filter pushdown.
    """
    start_ms = int(
        datetime.fromisoformat(start_date)
        .replace(tzinfo=timezone.utc)
        .timestamp() * 1000
    )
    end_ms = int(
        datetime.fromisoformat(end_date).replace(tzinfo=timezone.utc).timestamp()
        * 1000
    ) + 86_399_999  # inclusive end-of-day

    def fetch(start: int) -> list[dict]:
        payload = policy.call(
            lambda: transport.get(
                "posts",
                {"q": "author", "author": org_urn, "start": start, "count": page_size},
            )
        )
        return payload.get("elements", [])

    rows: list[dict] = []
    for batch in early_stop_pages(
        fetch, lambda p: p.get("createdAt", 0) < start_ms, page_size=page_size
    ):
        rows.extend(
            flatten_post(p) for p in batch if p.get("createdAt", 0) <= end_ms
        )
    return rows_to_df(spark, rows, POSTS_SCHEMA)


def read_engagement(
    spark: SparkSession,
    transport,
    post_urns: list[str],
    policy: RetryPolicy = LINKEDIN_POLICY,
) -> DataFrame:
    """S17: per-URN socialActions lookup fan-out; 429 ⇒
    QuotaExhaustedError aborts the stage (R2, linkedin_organic.py:339-370)."""

    def fetch_task(task: dict) -> list[dict]:
        urn = task["post_urn"]
        payload = policy.call(lambda: transport.get(f"socialActions/{urn}", None))
        return [
            {
                "post_urn": urn,
                "likes": int(payload.get("likesSummary", {}).get("totalLikes", 0)),
                "comments": int(
                    payload.get("commentsSummary", {}).get("aggregatedTotalComments", 0)
                ),
                "shares": int(payload.get("sharesSummary", {}).get("totalShares", 0)),
            }
        ]

    tasks = [{"post_urn": u} for u in post_urns]
    return fanout_fetch(spark, tasks, fetch_task, ENGAGEMENT_SCHEMA)


def engagement_for_posts(
    posts: DataFrame,
    transport,
    policy: RetryPolicy = LINKEDIN_POLICY,
) -> DataFrame:
    """S17 executor-side: socialActions lookups run as Arrow-batched
    ``mapInPandas`` over the posts frame's own partitions — the S12
    batch-lookup shape (``facebook_organic.read_post_insights``), so no
    post rows are ever collected to the driver. 429 raises
    QuotaExhaustedError inside the task (R2); see
    :func:`posts_with_engagement` for the R9 degradation wrapper."""
    import pandas as pd  # local: executors need only the closure

    def run(batches):
        for pdf in batches:
            rows = []
            for urn in pdf["post_urn"]:
                payload = policy.call(
                    lambda u=urn: transport.get(f"socialActions/{u}", None)
                )
                rows.append(
                    {
                        "post_urn": urn,
                        "likes": int(
                            payload.get("likesSummary", {}).get("totalLikes", 0)
                        ),
                        "comments": int(
                            payload.get("commentsSummary", {}).get(
                                "aggregatedTotalComments", 0
                            )
                        ),
                        "shares": int(
                            payload.get("sharesSummary", {}).get("totalShares", 0)
                        ),
                    }
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in ENGAGEMENT_SCHEMA.fields]
                )

    return posts.select("post_urn").mapInPandas(run, ENGAGEMENT_SCHEMA)


def posts_with_engagement(
    spark: SparkSession,
    transport,
    posts: DataFrame,
    policy: RetryPolicy = LINKEDIN_POLICY,
) -> DataFrame:
    """J1+F10 with R9 degradation: posts ⟕ engagement, nulls → 0 → long
    (linkedin_organic.py:589-592); quota exhaustion mid-enrichment returns
    posts WITHOUT engagement columns instead of failing (:577-587).

    The enrichment itself is fully executor-side
    (:func:`engagement_for_posts`); the only driver action here is the
    persist-then-count that materializes the lookups so a quota error
    surfaces BEFORE the join is returned — it moves no data rows.
    """
    engagement = engagement_for_posts(posts, transport, policy).persist()
    try:
        # Materialize now so quota errors surface here, not in the join.
        # Executor-side QuotaExhaustedError arrives wrapped in the Spark
        # task failure, so match by name too.
        engagement.count()
    except QuotaExhaustedError:
        engagement.unpersist()
        return posts  # R9: graceful degradation
    except Exception as exc:  # noqa: BLE001
        if "QuotaExhaustedError" in str(exc):
            engagement.unpersist()
            return posts  # R9 via wrapped executor failure
        raise
    return left_join_fill_zero(
        posts, engagement, "post_urn",
        fill_cols=["likes", "comments", "shares"], cast="long",
    )
