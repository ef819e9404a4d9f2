"""Meta (Facebook) Ads Insights source (SURVEY §2.1 S8/S9, §2.7 F15).

Reference semantics (d2b_data/Facebook_Marketing.py):

- ``get_report``: launch an async insights job (up to 10 launch tries,
  exp backoff), poll ``async_status`` every 20 s up to 60 tries after a
  10 s initial wait, then export records; ``Job Failed`` raises
  (Facebook_Marketing.py:124-235) → retry.AsyncJobPoller.
- Empty results still carry the declared columns
  ``fields + breakdowns + [date_start, date_stop, account_id]``
  (:74-79).
- ``def_report_array_accounts`` loops accounts and concatenates
  (:237-245) → multi-account fan-out.
- ``actions`` arrive as ``[{action_type, value}]`` arrays; the distinct
  action types are collected and each becomes an ``_action_{type}``
  column whose value is the first matching element's ``value``, else 0
  (:247-265) → higher-order functions, no UDF (F15).

Spark shape: accounts × windows form the fan-out task table; each task
runs its own async job through the poller. Action expansion is a
two-pass dynamic-schema op (distinct types = one small action, SURVEY
§7.5.3) and stays entirely in Catalyst expressions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from d2b_dataframework_spark.functions.nested import action_value
from d2b_dataframework_spark.sources.rest import fanout_fetch, rows_to_df
from d2b_dataframework_spark.sources.retry import AsyncJobPoller

ACTION_TYPE = ArrayType(
    StructType(
        [StructField("action_type", StringType()), StructField("value", StringType())]
    )
)


def report_schema(fields: list[str], breakdowns: list[str] | None = None) -> StructType:
    """Default columns = fields + breakdowns + [date_start, date_stop,
    account_id] (Facebook_Marketing.py:74-79); ``actions`` is the nested
    array when requested."""
    cols = [*fields, *(breakdowns or []), "date_start", "date_stop", "account_id"]
    out = []
    for c in cols:
        out.append(
            StructField(c, ACTION_TYPE if c == "actions" else StringType())
        )
    return StructType(out)


def fetch_async_report(
    transport,
    act_id: str,
    params: dict,
    poller: AsyncJobPoller | None = None,
) -> list[dict]:
    """S8: launch + poll + export against a transport whose endpoints are
    ``{act_id}/insights`` (launch → {report_run_id}), ``{job_id}`` (status
    → {async_status, async_percent_completion}), ``{job_id}/insights``
    (export → {data: [...]}) — the Graph API shapes the SDK wraps."""
    poller = poller or AsyncJobPoller()

    def launch():
        resp = transport.get(f"{act_id}/insights", params)
        return resp["report_run_id"]

    def check(job_id):
        status = transport.get(str(job_id), None)["async_status"]
        return {
            "Job Completed": "completed",
            "Job Failed": "failed",
        }.get(status, "running")

    def fetch(job_id):
        return transport.get(f"{job_id}/insights", None).get("data", [])

    return poller.run(launch, check, fetch)


def read_report(
    spark: SparkSession,
    transport,
    act_id: str,
    params: dict,
    fields: list[str],
    breakdowns: list[str] | None = None,
    poller: AsyncJobPoller | None = None,
) -> DataFrame:
    """Single-account async-job scan with the declared empty-result
    schema (Facebook_Marketing.py:124-235, 74-79)."""
    schema = report_schema(fields, breakdowns)
    records = fetch_async_report(transport, act_id, params, poller)
    cols = [f.name for f in schema.fields]
    rows = [{c: r.get(c) for c in cols} for r in records]
    return rows_to_df(spark, rows, schema)


def read_report_accounts(
    spark: SparkSession,
    transport,
    account_ids: list[str],
    params: dict,
    fields: list[str],
    breakdowns: list[str] | None = None,
    poller: AsyncJobPoller | None = None,
) -> DataFrame:
    """S9: multi-account fan-out — one mapInPandas task per account, each
    running its own async job (replaces the serial account loop at
    Facebook_Marketing.py:237-245)."""
    schema = report_schema(fields, breakdowns)
    cols = [f.name for f in schema.fields]

    def fetch_task(task: dict) -> list[dict]:
        recs = fetch_async_report(transport, task["act_id"], params, poller)
        return [{c: r.get(c) for c in cols} for r in recs]

    tasks = [{"act_id": a} for a in account_ids]
    return fanout_fetch(spark, tasks, fetch_task, schema)


def distinct_action_types(df: DataFrame, col: str = "actions") -> list[str]:
    """Pass 1 of the dynamic expansion: collect the set of action_types
    present (Facebook_Marketing.py:247-257). One small distinct action."""
    return sorted(
        r[0]
        for r in df.select(F.explode_outer(col).alias("a"))
        .select("a.action_type")
        .where(F.col("action_type").isNotNull())
        .distinct()
        .collect()
    )


def expand_actions(
    df: DataFrame, col: str = "actions", action_types: list[str] | None = None
) -> DataFrame:
    """Pass 2 (F15): one ``_action_{type}`` column per type — first
    matching element's value, else '0' (Facebook_Marketing.py:259-265).
    Values stay strings like the API returns them."""
    types = action_types if action_types is not None else distinct_action_types(df, col)
    return reduce(
        lambda acc, t: acc.withColumn(
            f"_action_{t}", action_value(col, t, default="0")
        ),
        types,
        df,
    )
