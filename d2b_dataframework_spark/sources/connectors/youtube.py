"""YouTube public-data source (SURVEY §2.1 S26–S30, §2.3 P1, §2.7 F9/F20,
§2.11 R6).

Reference semantics (d2b_data/youtube_public.py):

- ``list_channels``: ``channels().list(part=…)`` by id/forUsername;
  ``mine=True`` rejected (:139-178).
- ``get_playlist_videos``: pageToken walk → video-id list (:184-218).
- ``get_video_statistics``: ``videos().list(id=…)`` in batches of 50 ids
  (:220-256, batching :243-249) → keyed batch fan-out.
- ``_get_channel_videos_raw``: channel → ``relatedPlaylists.uploads`` →
  playlist walk → stats batches (:258-300).
- Comments: ``commentThreads().list`` pagination; 403 ``commentsDisabled``
  skips the video, any other 403 raises (R6 variant, :358-421).
- Column validation: requested columns are checked against the live
  response; unknown → error listing what exists (P1, :84-121) →
  core.errors.SchemaValidationError.
- Counters coerce to nullable ints (F9, :333-342); ``extracted_at``
  audit column inserted first (F20, :123-133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql.types import LongType, StringType, StructField, StructType

from d2b_dataframework_spark.core.errors import SchemaValidationError
from d2b_dataframework_spark.sources.pagination import batched_keys, cursor_pages
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df

STATS_BATCH = 50  # youtube_public.py:243-246
COMMENTS_PAGE = 100  # youtube_public.py:361

CHANNELS_SCHEMA = StructType(
    [
        StructField("channel_id", StringType()),
        StructField("title", StringType()),
        StructField("uploads_playlist", StringType()),
        StructField("subscriber_count", LongType()),
        StructField("video_count", LongType()),
    ]
)

VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("snippet_publishedAt", StringType()),
        StructField("snippet_title", StringType()),
        StructField("statistics_viewCount", LongType()),
        StructField("statistics_likeCount", LongType()),
        StructField("statistics_commentCount", LongType()),
        StructField("statistics_favoriteCount", LongType()),
    ]
)

COMMENTS_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("comment_published_at", StringType()),
        StructField("comment_text", StringType()),
        StructField("comment_like_count", LongType()),
        StructField("total_reply_count", LongType()),
    ]
)


def _to_long(v) -> int | None:
    """F9: to_numeric(errors='coerce').astype('Int64')
    (youtube_public.py:333-342)."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def validate_columns(requested: list[str], available: list[str]) -> None:
    """P1: unknown column ⇒ error listing available
    (youtube_public.py:84-121)."""
    unknown = [c for c in requested if c not in available]
    if unknown:
        raise SchemaValidationError(
            f"unknown columns {unknown}; available: {sorted(available)}"
        )


def read_channels(
    spark: SparkSession, transport, channel_ids: list[str] | None = None,
    for_username: str | None = None,
) -> DataFrame:
    """S26: channels().list by id/forUsername; mine=True rejected
    (youtube_public.py:139-178)."""
    if not channel_ids and not for_username:
        raise ValueError("provide channel_ids or for_username (mine=True unsupported)")
    params = {"part": "snippet,statistics,contentDetails"}
    if channel_ids:
        params["id"] = ",".join(channel_ids)
    else:
        params["forUsername"] = for_username
    payload = transport.get("channels", params)
    rows = [
        {
            "channel_id": it.get("id"),
            "title": it.get("snippet", {}).get("title"),
            "uploads_playlist": it.get("contentDetails", {})
            .get("relatedPlaylists", {})
            .get("uploads"),
            "subscriber_count": _to_long(it.get("statistics", {}).get("subscriberCount")),
            "video_count": _to_long(it.get("statistics", {}).get("videoCount")),
        }
        for it in payload.get("items", [])
    ]
    return rows_to_df(spark, rows, CHANNELS_SCHEMA)


def playlist_video_ids(transport, playlist_id: str) -> list[str]:
    """S27: playlistItems pageToken walk → id list
    (youtube_public.py:184-218)."""

    def fetch(token):
        params = {"playlistId": playlist_id, "part": "contentDetails", "maxResults": 50}
        if token:
            params["pageToken"] = token
        payload = transport.get("playlistItems", params)
        ids = [
            it.get("contentDetails", {}).get("videoId")
            for it in payload.get("items", [])
        ]
        return ids, payload.get("nextPageToken")

    out: list[str] = []
    for batch in cursor_pages(fetch):
        out.extend(batch)
    return out


def read_video_statistics(
    spark: SparkSession,
    transport,
    video_ids: list[str],
    columns: list[str] | None = None,
    batch_size: int = STATS_BATCH,
) -> DataFrame:
    """S28: 50-id batch lookups as a fan-out — one task per batch
    (youtube_public.py:220-256); P1 validation against the declared
    schema."""
    available = [f.name for f in VIDEO_STATS_SCHEMA.fields]
    if columns:
        validate_columns(columns, available)

    batches = [{"ids": ",".join(b)} for b in batched_keys(video_ids, batch_size)]

    def fetch_task(task: dict) -> list[dict]:
        payload = transport.get(
            "videos", {"id": task["ids"], "part": "snippet,statistics"}
        )
        rows = []
        for it in payload.get("items", []):
            sn, st = it.get("snippet", {}), it.get("statistics", {})
            rows.append(
                {
                    "id": it.get("id"),
                    "snippet_publishedAt": sn.get("publishedAt"),
                    "snippet_title": sn.get("title"),
                    "statistics_viewCount": _to_long(st.get("viewCount")),
                    "statistics_likeCount": _to_long(st.get("likeCount")),
                    "statistics_commentCount": _to_long(st.get("commentCount")),
                    "statistics_favoriteCount": _to_long(st.get("favoriteCount")),
                }
            )
        return rows

    df = fanout_fetch(spark, batches, fetch_task, VIDEO_STATS_SCHEMA)
    return df.select(*columns) if columns else df


def read_channel_videos(
    spark: SparkSession, transport, channel_id: str
) -> DataFrame:
    """S29: channel → uploads playlist → video ids → stats batches
    (youtube_public.py:258-300)."""
    channels = read_channels(spark, transport, [channel_id]).collect()
    if not channels:
        return rows_to_df(spark, [], VIDEO_STATS_SCHEMA)
    uploads = channels[0]["uploads_playlist"]
    ids = playlist_video_ids(transport, uploads)
    return read_video_statistics(spark, transport, ids)


def read_video_comments(
    spark: SparkSession,
    transport,
    video_ids: list[str],
    max_results: int = COMMENTS_PAGE,
) -> DataFrame:
    """S30: commentThreads fan-out; 403 commentsDisabled skips the video,
    other 403s raise (youtube_public.py:396-410)."""

    def fetch_task(task: dict) -> list[dict]:
        vid = task["video_id"]
        rows: list[dict] = []

        def fetch(token):
            params = {"videoId": vid, "part": "snippet", "maxResults": max_results}
            if token:
                params["pageToken"] = token
            payload = transport.get("commentThreads", params)
            return payload.get("items", []), payload.get("nextPageToken")

        try:
            for batch in cursor_pages(fetch):
                for it in batch:
                    top = (
                        it.get("snippet", {})
                        .get("topLevelComment", {})
                        .get("snippet", {})
                    )
                    rows.append(
                        {
                            "video_id": vid,
                            "comment_published_at": top.get("publishedAt"),
                            "comment_text": top.get("textDisplay"),
                            "comment_like_count": _to_long(top.get("likeCount")),
                            "total_reply_count": _to_long(
                                it.get("snippet", {}).get("totalReplyCount")
                            ),
                        }
                    )
        except Exception as exc:  # noqa: BLE001
            if getattr(exc, "status_code", None) == 403 and "commentsDisabled" in str(exc):
                return []  # skip this video, keep the scan alive
            raise
        return rows

    tasks = [{"video_id": v} for v in video_ids]
    return fanout_fetch(spark, tasks, fetch_task, COMMENTS_SCHEMA)
