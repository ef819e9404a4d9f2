"""TikTok Ads report source (SURVEY §2.1 S18/S19, §2.3 P6, §2.6 D3).

Reference semantics (d2b_data/tiktok_marketing.py):

- ``get_report_dataframe``: GET ``report/integrated/get`` with
  advertiser_id, dims, metrics, data_level; ``page_size=1000``,
  page-number pagination via ``page_info.total_page`` (:331-451, page
  loops :353-384, :404-438).
- Time-series mode (``stat_time_day`` requested) splits the range into
  ≤30-day windows (``+29 days`` step); lifetime mode caps at 365 days
  (:288-296, :346-349) → sources.datesplit.
- Flatten: ``pd.json_normalize`` then keep LEAF column names
  (``col.split('.')[-1]``, P6, :388,444) — collision-aware here.
- Sort by ``stat_time_day`` (D3, :446).
- Retry: 429-only backoff (R3, :125-154) → retry.TIKTOK_POLICY.

Spark shape: (window × page) would be ideal, but total_page is only
known after page 1 — so the fan-out axis is the WINDOW (chunk); the page
loop runs inside each task. 12 months of data = 12+ parallel tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from d2b_dataframework_spark.sources.datesplit import cap_range, split_range
from d2b_dataframework_spark.sources.pagination import page_number_pages
from d2b_dataframework_spark.sources.rest import fanout_fetch
from d2b_dataframework_spark.sources.retry import TIKTOK_POLICY, RetryPolicy

PAGE_SIZE = 1000  # tiktok_marketing.py:364,415
MAX_WINDOW_DAYS = 30  # tiktok_marketing.py:290
LIFETIME_CAP_DAYS = 365  # tiktok_marketing.py:346-349


def leaf_names(columns: list[str]) -> dict[str, str]:
    """P6: dotted → leaf names, collision-aware (suffix duplicates keep
    their penultimate qualifier instead of silently overwriting —
    tiktok_marketing.py:388,444 overwrites; divergence documented)."""
    out: dict[str, str] = {}
    seen: dict[str, int] = {}
    for col in columns:
        leaf = col.split(".")[-1]
        if leaf in seen:
            parts = col.split(".")
            leaf = "_".join(parts[-2:]) if len(parts) > 1 else f"{leaf}_{seen[leaf]}"
        seen[leaf] = seen.get(leaf, 0) + 1
        out[col] = leaf
    return out


def flatten_record(rec: dict) -> dict:
    """json_normalize equivalent: nested dicts → dotted keys, one level
    deep is all the API nests (dimensions/metrics)."""
    flat: dict = {}
    for k, v in rec.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                flat[f"{k}.{k2}"] = v2
        else:
            flat[k] = v
    return flat


def report_schema(dimensions: list[str], metrics: list[str]) -> StructType:
    """TikTok returns every metric as a string (docstring example,
    tiktok_marketing.py:38-44)."""
    return StructType(
        [StructField(c, StringType()) for c in [*dimensions, *metrics]]
    )


def _fetch_window(
    transport,
    advertiser_id: str,
    start_date: str,
    end_date: str,
    dimensions: list[str],
    metrics: list[str],
    data_level: str,
    page_size: int,
    policy: RetryPolicy,
    filtering: list[dict] | None = None,
) -> list[dict]:
    """Page-number loop for one window (tiktok_marketing.py:404-438).
    ``filtering`` is the API's filter list (tiktok_marketing.py:284 —
    the reference JSON-encodes it into the request params); the DSv2
    reader builds it from pushed-down predicates."""
    rename = leaf_names(
        [f"dimensions.{d}" for d in dimensions] + [f"metrics.{m}" for m in metrics]
    )

    def fetch(page: int):
        body = {
            "advertiser_id": advertiser_id,
            "start_date": start_date,
            "end_date": end_date,
            "dimensions": dimensions,
            "metrics": metrics,
            "data_level": data_level,
            "page": page,
            "page_size": page_size,
        }
        if filtering:
            body["filtering"] = filtering
        payload = policy.call(
            lambda: transport.get("report/integrated/get", body)
        )
        if payload.get("code", 0) != 0:
            raise RuntimeError(
                f"tiktok error {payload.get('code')}: {payload.get('message')}"
            )  # all-or-nothing scan (tiktok_marketing.py:370-371,422-425)
        data = payload.get("data", {})
        rows = [
            {rename.get(k, k): v for k, v in flatten_record(r).items()}
            for r in data.get("list", [])
        ]
        return rows, int(data.get("page_info", {}).get("total_page", 1))

    out: list[dict] = []
    for page_rows in page_number_pages(fetch):
        out.extend(page_rows)
    return out


def read_report(
    spark: SparkSession,
    transport,
    advertiser_id: str,
    start_date: str,
    end_date: str,
    dimensions: list[str],
    metrics: list[str],
    data_level: str = "AUCTION_AD",
    page_size: int = PAGE_SIZE,
    policy: RetryPolicy = TIKTOK_POLICY,
) -> DataFrame:
    """S18+S19 composed: windowed fan-out scan, sorted by stat_time_day
    when present (D3)."""
    time_series = "stat_time_day" in dimensions
    if time_series:
        windows = split_range(start_date, end_date, max_days=MAX_WINDOW_DAYS)
    else:
        windows = [cap_range(start_date, end_date, max_days=LIFETIME_CAP_DAYS)]

    schema = report_schema(dimensions, metrics)

    def fetch_task(task: dict) -> list[dict]:
        return _fetch_window(
            transport, advertiser_id, task["start"], task["end"],
            dimensions, metrics, data_level, page_size, policy,
        )

    tasks = [{"start": s, "end": e} for s, e in windows]
    df = fanout_fetch(spark, tasks, fetch_task, schema)
    if time_series:
        df = df.orderBy("stat_time_day")
    return df
