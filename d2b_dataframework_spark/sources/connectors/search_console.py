"""Google Search Console source (SURVEY §2.1 S5–S7).

Reference semantics (d2b_data/search_console.py):

- ``get_report_df`` posts ``searchanalytics().query`` with dimensions,
  optional ``dimensionFilterGroups``, ``searchType`` and ``dataState``
  (search_console.py:148-217); the request body is built by
  ``_create_query`` (:219-260).
- The ``date`` dimension is ALWAYS appended to the requested dimensions
  (:188-191) so outputs are day-attributable.
- Pagination: ``startRow += row_limit`` (default 25 000, :33) until a
  short/empty page (:325-392).
- Flatten: each row's ``keys`` zips with the dimension list; metrics
  ``clicks, impressions, ctr, position`` default to 0 when absent
  (:394-441). Empty results return a typed empty frame with the same
  columns (:443-464).

Spark shape: one fan-out task per (date-window) when the caller splits;
the startRow loop itself is serial-per-task (page count unknown up
front). Metrics are numeric on the Spark side (LongType counts,
DoubleType ratios) exactly as pandas infers them in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from d2b_dataframework_spark.sources.datesplit import split_range
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df
from d2b_dataframework_spark.sources.retry import GOOGLE_POLICY, RetryPolicy

ROW_LIMIT = 25_000  # search_console.py:33

METRIC_FIELDS = [
    StructField("clicks", LongType()),
    StructField("impressions", LongType()),
    StructField("ctr", DoubleType()),
    StructField("position", DoubleType()),
]


def report_schema(dimensions: list[str]) -> StructType:
    """dims (strings) + fixed metric columns (search_console.py:443-464)."""
    return StructType(
        [StructField(d, StringType()) for d in dimensions] + METRIC_FIELDS
    )


def with_date_dimension(dimensions: list[str]) -> list[str]:
    """S7: ``date`` is always present (search_console.py:188-191)."""
    return dimensions if "date" in dimensions else [*dimensions, "date"]


def create_query(
    start_date: str,
    end_date: str,
    dimensions: list[str],
    dimension_filter_groups: list[dict] | None = None,
    search_type: str = "web",
    data_state: str = "final",
    row_limit: int = ROW_LIMIT,
    start_row: int = 0,
) -> dict:
    """Request-body builder (search_console.py:219-260)."""
    body: dict = {
        "startDate": start_date,
        "endDate": end_date,
        "dimensions": dimensions,
        "searchType": search_type,
        "dataState": data_state,
        "rowLimit": row_limit,
        "startRow": start_row,
    }
    if dimension_filter_groups:
        body["dimensionFilterGroups"] = dimension_filter_groups
    return body


def flatten_rows(payload: dict, dimensions: list[str]) -> list[dict]:
    """keys→dims zip + 0-defaulted metrics (search_console.py:394-441)."""
    out = []
    for row in payload.get("rows", []):
        rec: dict = dict(zip(dimensions, row.get("keys", [])))
        rec["clicks"] = int(row.get("clicks", 0))
        rec["impressions"] = int(row.get("impressions", 0))
        rec["ctr"] = float(row.get("ctr", 0.0))
        rec["position"] = float(row.get("position", 0.0))
        out.append(rec)
    return out


def _fetch_window(
    transport,
    property_uri: str,
    start_date: str,
    end_date: str,
    dimensions: list[str],
    dimension_filter_groups,
    search_type: str,
    data_state: str,
    row_limit: int,
    policy: RetryPolicy,
) -> list[dict]:
    """startRow loop for one window (search_console.py:325-392)."""
    rows: list[dict] = []
    start_row = 0
    while True:
        body = create_query(
            start_date, end_date, dimensions, dimension_filter_groups,
            search_type, data_state, row_limit, start_row,
        )
        payload = policy.call(lambda b=body: transport.get(property_uri, b))
        page = flatten_rows(payload, dimensions)
        rows.extend(page)
        if len(page) < row_limit:
            return rows
        start_row += row_limit


def read_report(
    spark: SparkSession,
    transport,
    property_uri: str,
    start_date: str,
    end_date: str,
    dimensions: list[str],
    dimension_filter_groups: list[dict] | None = None,
    search_type: str = "web",
    data_state: str = "final",
    row_limit: int = ROW_LIMIT,
    split_days: int | None = None,
    policy: RetryPolicy = GOOGLE_POLICY,
) -> DataFrame:
    """S5+S6+S7 composed scan.

    ``split_days`` turns the single serial startRow walk into a fan-out of
    per-window walks (the Spark-scale path); None keeps the reference's
    one-window behavior on the driver.
    """
    dims = with_date_dimension(dimensions)
    schema = report_schema(dims)

    if split_days is None:
        rows = _fetch_window(
            transport, property_uri, start_date, end_date, dims,
            dimension_filter_groups, search_type, data_state, row_limit, policy,
        )
        return rows_to_df(spark, rows, schema)

    windows = split_range(start_date, end_date, max_days=split_days)

    def fetch_task(task: dict) -> list[dict]:
        return _fetch_window(
            transport, property_uri, task["start"], task["end"], dims,
            dimension_filter_groups, search_type, data_state, row_limit, policy,
        )

    tasks = [{"start": s, "end": e} for s, e in windows]
    return fanout_fetch(spark, tasks, fetch_task, schema)
