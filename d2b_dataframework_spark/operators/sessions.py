"""Sessionization: gap-based session assignment over an event stream.

The classic clickstream operator (GA4's session model — reference
consumes pre-sessionized GA4 reports, d2b_data/Google_GA4.py:88-120;
here we provide the operator itself so raw event tables can be rolled
up the same way): a new session starts when the gap to the user's
previous event exceeds ``gap_minutes``.

Scale design: ONE shuffle on the user key, then two window passes over
the same (user, ts) sort order — Catalyst collapses them into a single
Sort + Window chain, so at 100TB the cost is one exchange + one sort
per partition. No Python, no self-join (the naive "join events to
events within gap" formulation is quadratic per user and unsortable at
scale). Ties on ``ts`` are broken by ``tiebreaker`` so session indexes
are deterministic — required for cross-engine hash-stable results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from d2b_dataframework_spark.functions.datetimes import as_instant


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreaker: str = "event_id",
) -> DataFrame:
    """Assign ``session_idx`` (0-based per user) and ``session_id``
    (``user-idx``, globally unique) to every event row.

    A session boundary is a gap strictly greater than ``gap_minutes``
    between consecutive events of the same user. Comparison happens in
    epoch microseconds (``unix_micros``) so sub-second gaps are exact
    and the expression is portable to any ANSI engine (``epoch_us`` in
    DuckDB).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreaker))
    gap_us = F.lit(int(gap_minutes) * 60 * 1_000_000)
    prev = F.lag(F.unix_micros(as_instant(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(as_instant(ts_col)) - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreaker)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df.withColumn("_new_session", is_new)
    out = out.withColumn(
        "session_idx", (F.sum("_new_session").over(run) - F.lit(1)).cast("long")
    ).drop("_new_session")
    return out.withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_idx")),
    )


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str | None = "value",
    tiebreaker: str = "event_id",
) -> DataFrame:
    """Per-session rollup: start/end, duration, event count, distinct
    event types, and (optionally) a decimal-exact value total cast back
    to double (the engine's cross-engine-stable money convention).

    The groupBy reuses the sessionize shuffle key prefix (user), so AQE
    plans it as a single exchange chain.
    """
    sess = sessionize(df, user_col, ts_col, gap_minutes, tiebreaker)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp_ltz"))
            - F.unix_micros(F.min(ts_col).cast("timestamp_ltz"))
        ).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
    return sess.groupBy(user_col, "session_idx").agg(*aggs)
