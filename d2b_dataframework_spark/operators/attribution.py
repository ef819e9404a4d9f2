"""Marketing attribution & cohort operators.

The reference is a marketing ETL framework: its consumers join ad/
organic touchpoints to conversions downstream in BigQuery (the SQL the
reference's README sketches around `d2b_data/Facebook_Marketing.py` /
`d2b_data/Google_GA4.py` outputs). These operators bring that analysis
layer into the engine as first-class distributed ops.

Scale shapes:

* :func:`last_touch_attribution` — one window partitioned by the user
  key (millions of partitions → fully parallel; never a global window)
  carrying the most recent qualifying touch forward, then a tiny
  per-touch-type aggregate.
* :func:`cohort_retention` — two aggregates and a join, all shuffled on
  the same user key, so AQE chains them over one exchange; output is
  |cohort days| × |offsets| rows (tiny at any corpus size).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    tiebreaker: str = "event_id",
) -> DataFrame:
    """Attribute each conversion's value to the most recent preceding
    touch event (same user, at-or-before the conversion); conversions
    with no prior touch land in ``touch_type='none'``.

    Returns one row per touch type: ``touch_type, n_conversions,
    attributed_value`` (decimal-exact sum cast to double).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreaker).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.last(
        F.when(F.col(type_col).isin(*touch_types), F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("_touch", touch)
        .filter(F.col(type_col) == conversion_type)
        .groupBy(F.coalesce(F.col("_touch"), F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention triangle: cohort = the user's first
    active day; for every (cohort_day, day_offset) count the distinct
    users from that cohort active ``day_offset`` days later.

    Returns ``cohort_day (yyyy-MM-dd), day_offset, n_users``; offset 0
    is the cohort size.
    """
    day = F.to_date(ts_col)
    first = events.groupBy(user_col).agg(F.min(day).alias("_cohort"))
    active = events.select(F.col(user_col), day.alias("_day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("_day", "_cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("n_users"))
    )
