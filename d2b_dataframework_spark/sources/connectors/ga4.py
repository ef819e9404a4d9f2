"""GA4 Analytics Data API source (SURVEY §2.1 S2–S4).

Reference semantics (d2b_data/Google_GA4.py):

- ``get_report_df`` runs a ``batchRunReports`` body and returns a table
  whose columns are ``dimensionHeaders + metricHeaders``; every value
  arrives as a string (Google_GA4.py:114-138, :197-209).
- Auto-pagination splits the requested range day-by-day "to avoid
  sampling and API limits", then pages each day by ``offset`` in
  250 000-row chunks until a short page (Google_GA4.py:230-317).
- Sampling metadata (``samplesReadCounts`` / ``samplingSpaceSizes``) is
  extracted per response and appended as columns: percentage, boolean
  ``sampled``, ``dataLossFromOtherRow`` (Google_GA4.py:35-66, :219-226).
- Retries: HTTP 429/5xx backed off ``2**n + jitter`` up to 5 times
  (Google_GA4.py:145-195) → retry.GOOGLE_POLICY.

Spark shape: the reference's serial day loop becomes a **task-table
fan-out** — one task per day, distributed via ``mapInPandas``; the offset
loop (pages within a day are discovered, not known up front) stays inside
the task. At 1000 executors this fetches 1000 days concurrently while
keeping per-day ordering semantics identical to the reference.
"""

from __future__ import annotations

import copy
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from d2b_dataframework_spark.sources.datesplit import split_range
from d2b_dataframework_spark.sources.pagination import offset_pages
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df
from d2b_dataframework_spark.sources.retry import GOOGLE_POLICY, RetryPolicy

PAGE_SIZE = 250_000  # Google_GA4.py:287 limit_per_request

SAMPLING_FIELDS = [
    StructField("samplesReadCounts", LongType()),
    StructField("samplingSpaceSizes", LongType()),
    StructField("sampling_percentage", DoubleType()),
    StructField("sampled", BooleanType()),
    StructField("dataLossFromOtherRow", BooleanType()),
]


def report_schema(
    dimensions: list[str], metrics: list[str], sampling: bool = False
) -> StructType:
    """GA4 output contract: every dim/metric column is a string
    (Google_GA4.py:130-136); sampling columns appended when requested."""
    fields = [StructField(c, StringType()) for c in [*dimensions, *metrics]]
    if sampling:
        fields += SAMPLING_FIELDS
    return StructType(fields)


def query_columns(query: dict) -> tuple[list[str], list[str]]:
    req = query["requests"][0] if "requests" in query else query
    dims = [d["name"] for d in req.get("dimensions", [])]
    mets = [m["name"] for m in req.get("metrics", [])]
    return dims, mets


def extract_sampling(payload: dict) -> dict[str, Any]:
    """Sampling metadata per Google_GA4.py:35-66: percentage =
    100 * read/space over the summed counts; absent metadata → unsampled."""
    meta = payload.get("metadata", {})
    reads = payload.get("samplesReadCounts") or meta.get("samplesReadCounts") or []
    spaces = payload.get("samplingSpaceSizes") or meta.get("samplingSpaceSizes") or []
    read_n = sum(int(x) for x in reads) if reads else None
    space_n = sum(int(x) for x in spaces) if spaces else None
    pct = (100.0 * read_n / space_n) if read_n and space_n else None
    return {
        "samplesReadCounts": read_n,
        "samplingSpaceSizes": space_n,
        "sampling_percentage": pct,
        "sampled": bool(reads),
        "dataLossFromOtherRow": bool(meta.get("dataLossFromOtherRow", False)),
    }


def flatten_report(payload: dict, sampling: bool = False) -> list[dict]:
    """Headers → columns, rows → string values (Google_GA4.py:114-138)."""
    dims = [h["name"] for h in payload.get("dimensionHeaders", [])]
    mets = [h["name"] for h in payload.get("metricHeaders", [])]
    samp = extract_sampling(payload) if sampling else {}
    out = []
    for row in payload.get("rows", []):
        rec: dict[str, Any] = {}
        for name, cell in zip(dims, row.get("dimensionValues", [])):
            rec[name] = cell.get("value")
        for name, cell in zip(mets, row.get("metricValues", [])):
            rec[name] = cell.get("value")
        out.append({**rec, **samp})
    return out


def daily_query(query: dict, day: str) -> dict:
    """1-day copy of the request (Google_GA4.py:319-329 _create_daily_query)."""
    q = copy.deepcopy(query)
    req = q["requests"][0] if "requests" in q else q
    req["dateRanges"] = [{"startDate": day, "endDate": day}]
    return q


def _fetch_day(
    transport,
    property_id: str,
    query: dict,
    day: str,
    sampling: bool,
    page_size: int,
    policy: RetryPolicy,
) -> list[dict]:
    """Offset loop for one day (Google_GA4.py:275-317), executor-side."""
    q = daily_query(query, day)
    req = q["requests"][0] if "requests" in q else q

    def fetch(offset: int, limit: int) -> list[dict]:
        body = copy.deepcopy(req)
        body["offset"] = offset
        body["limit"] = limit
        payload = policy.call(
            lambda: transport.get(f"properties/{property_id}:batchRunReports", body)
        )
        return flatten_report(payload, sampling=sampling)

    rows: list[dict] = []
    for page in offset_pages(fetch, page_size=page_size):
        rows.extend(page)
    return rows


def read_realtime_report(
    spark: SparkSession,
    transport,
    property_id: str,
    query: dict,
    policy: RetryPolicy = GOOGLE_POLICY,
) -> DataFrame:
    """Realtime/intraday branch (Google_GA4.py:21,30; README.md:68 —
    vestigial in the reference, modeled here for API completeness).

    ``runRealtimeReport`` has no date ranges (``minuteRanges`` instead)
    and no offset pagination — one request, same header/row flattening
    and string-typed output contract as the core report scan. Realtime
    responses carry no sampling metadata.
    """
    dims, mets = query_columns(query)
    req = query["requests"][0] if "requests" in query else query
    payload = policy.call(
        lambda: transport.get(f"properties/{property_id}:runRealtimeReport", req)
    )
    return rows_to_df(spark, flatten_report(payload), report_schema(dims, mets))


def read_report(
    spark: SparkSession,
    transport,
    property_id: str,
    query: dict,
    extract_sampling_cols: bool = False,
    auto_paginate: bool = True,
    page_size: int = PAGE_SIZE,
    policy: RetryPolicy = GOOGLE_POLICY,
) -> DataFrame:
    """S2/S3/S4 composed: day-split fan-out scan with declared schema.

    ``auto_paginate=False`` reproduces the single-call path
    (Google_GA4.py:206-207): one request, no day split.
    """
    dims, mets = query_columns(query)
    schema = report_schema(dims, mets, sampling=extract_sampling_cols)

    if not auto_paginate:
        req = query["requests"][0] if "requests" in query else query
        payload = policy.call(
            lambda: transport.get(f"properties/{property_id}:batchRunReports", req)
        )
        return rows_to_df(spark, flatten_report(payload, extract_sampling_cols), schema)

    req = query["requests"][0] if "requests" in query else query
    dr = req["dateRanges"][0]
    days = [d for d, _ in split_range(dr["startDate"], dr["endDate"], max_days=1)]

    def fetch_task(task: dict) -> list[dict]:
        return _fetch_day(
            transport, property_id, query, task["day"],
            extract_sampling_cols, page_size, policy,
        )

    return fanout_fetch(spark, [{"day": d} for d in days], fetch_task, schema)
