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


def cusum_changepoint(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Retrospective single-changepoint detection per key: the split
    index k maximizing the centered CUSUM statistic
    ``|S_k - (k/n) * S_n|`` (S_k = prefix sum of values in order) — the
    binary-segmentation step every offline level-shift hunt starts from.
    Complements operators/recurrence.cusum_alerts, which is SEQUENTIAL
    (alert when drift accumulates); this is the batch "where did the
    level change" question, answered in one pass.

    Scale shape: one window over (key, order) for the prefix sum — per-
    key frames, fully parallel, the same boundedness contract as the
    recurrence family (one row per observation, e.g. per day) — then an
    argmax-by-struct aggregation (map-side combinable; ties break to the
    EARLIEST split). Interior splits only (k < n): the k = n term is
    identically 0 and would win every all-equal group with a misleading
    "change at the end".

    Returns one row per key: n, the change point's order value, the max
    statistic (rounded), and the before/after means.
    """
    w = Window.partitionBy(*key_cols).orderBy("_o")
    cum = df.select(
        *key_cols,
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("double").alias("_v"),
    ).withColumns(
        {
            "_k": F.row_number().over(w).cast("long"),
            "_sk": F.sum("_v").over(w),
        }
    )
    tot = cum.groupBy(*key_cols).agg(
        F.max("_k").alias("_n"), F.sum("_v").alias("_sn")
    )
    scored = cum.join(tot, key_cols).filter(F.col("_k") < F.col("_n")).select(
        *key_cols,
        "_o",
        "_k",
        "_n",
        "_sk",
        "_sn",
        F.abs(
            F.col("_sk")
            - F.col("_k").cast("double") / F.col("_n").cast("double") * F.col("_sn")
        ).alias("_stat"),
    )
    best = scored.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                F.col("_stat").alias("s"),
                (-F.col("_k")).alias("nk"),  # tie -> earliest split
                F.col("_o").alias("o"),
                F.col("_k").alias("k"),
                F.col("_sk").alias("sk"),
                F.col("_n").alias("n"),
                F.col("_sn").alias("sn"),
            )
        ).alias("_b")
    )
    return best.select(
        *key_cols,
        F.col("_b.n").cast("long").alias("n_points"),
        F.col("_b.o").alias("change_at"),
        F.round(F.col("_b.s"), 6).alias("cusum_stat"),
        F.round(F.col("_b.sk") / F.col("_b.k").cast("double"), 6).alias("mean_before"),
        F.round(
            (F.col("_b.sn") - F.col("_b.sk"))
            / (F.col("_b.n") - F.col("_b.k")).cast("double"),
            6,
        ).alias("mean_after"),
    )
