"""Dedup operators (SURVEY §2.6 D1/D2).

Reference semantics: ``sort_values(ts).drop_duplicates(subset=id,
keep="last")`` (d2b_data/Alodesk_API.py:29-44, ProphetForecaster.py:199).
The Spark-native form is a window ``row_number`` — one shuffle on the key,
map-side partial nothing, but at 100TB the shuffle partitions by ``keys``
so skewed ids should be rare; AQE skew-join handling covers the agg too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    tiebreakers: list[str] = (),
    coerce_ts: bool = False,
) -> DataFrame:
    """Keep the newest row per key.

    ``coerce_ts=True`` parses ``order_col`` with errors→NULL first
    (Alodesk parses with ``errors='coerce'``; NULL timestamps sort last in
    descending order here, i.e. lose to any valid timestamp — same as
    pandas NaT under keep="last" after sort).

    ``tiebreakers`` make the pick deterministic when ``order_col`` ties —
    required for hash-stable results (pandas keeps input order; a
    distributed engine has no input order, so we require explicit ones).
    """
    if isinstance(keys, str):
        keys = [keys]
    order = F.col(order_col)
    if coerce_ts:
        order = order.try_cast("timestamp")
    ordering = [order.desc_nulls_last()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of one column (A4) — drives per-partition writes."""
    return df.select(col).distinct()
