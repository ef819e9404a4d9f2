"""Pivot / aggregation operators (SURVEY §2.5 A1-A2).

References:
- pivot-sum:       d2b_data/linkedin_organic.py:448-456
- long→wide first: d2b_data/legacy/FacebookOrganic.py:318-321

Scale note: ``groupBy().pivot(col, values)`` with an explicit values list
is a single shuffle with map-side partial aggregation; without the list
Spark runs an extra distinct job to discover pivot values — always pass
``values`` when the domain is known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_sum(
    df: DataFrame,
    index: list[str],
    values: list[str],
) -> DataFrame:
    """Sum `values` per `index` group (A1). The reference's pivot_table
    with aggfunc=sum and no columns= is just a grouped sum."""
    return df.groupBy(*index).agg(*[F.sum(v).alias(v) for v in values])


def pivot_wide(
    df: DataFrame,
    index: str,
    column: str,
    value: str,
    agg: str = "first",
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """Long→wide pivot (A2): one column per distinct `column` value."""
    agg_fn = {"first": F.first, "sum": F.sum, "max": F.max, "min": F.min}[agg]
    grouped = df.groupBy(index)
    pivoted = grouped.pivot(column, pivot_values) if pivot_values else grouped.pivot(column)
    return pivoted.agg(agg_fn(F.col(value)))


def unpivot_long(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long unpivot (the inverse of :func:`pivot_wide`): one output
    row per (id, value column). Native ``DataFrame.unpivot`` — a
    per-row flatMap in the plan (Expand node), zero shuffle, scan-speed
    at any size. Null cells are kept (the round-trip inverse of a pivot
    whose absent combinations became nulls); filter afterwards to drop
    them."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
