"""Calendar resampling / gap-fill — the distributed analog of pandas
``asfreq('D')`` + ``ffill``.

The reference's forecasting prep materializes a complete daily index
per metric before fitting (ProphetForecaster's history assembly assumes
one row per day; pandas fills the calendar on a single machine). Here
the calendar is generated IN the engine: per-key date bounds (one agg),
``sequence()`` + ``explode`` (map-side row generation — no driver
loops, no cross join), a left join back to the actuals, and a
forward-fill window partitioned by key.

Scale shape: the bounds agg and the (key, day) join shuffle on the same
key family; the calendar explode multiplies the |keys| bounds rows —
never the fact table; the fill window is per-key (fully parallel). At
100TB the output is |keys| × |days| rows regardless of input row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_ffill(
    actual: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """``actual`` holds at most one row per (key, day). Returns one row
    per (key, every day in the key's [min, max] span) with the value
    forward-filled across gaps and ``was_filled`` marking synthesized
    rows. The first day per key is an actual by construction, so the
    fill never emits leading nulls.
    """
    bounds = actual.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    cal = bounds.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(day_col)
    )
    joined = cal.join(actual, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        day_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("was_filled"),
    )
