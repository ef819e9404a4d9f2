"""Interval-overlap join: which time ranges collide, per key.

The double-booking / conflicting-campaign / concurrent-session question
as a PAIR JOIN (operators/recurrence + q_concurrent_orders answer the
COUNT-over-time version via sweep-line; this returns the actual
colliding pairs). The join is blocked on the key columns — never a
global interval self-join — so candidate volume is sum(group^2) over
key groups, the copurchase_pairs bound; an optional ``max_group_size``
cap drops degenerate hot keys (same contract as the dedup family's
hot-bucket caps: capped keys are REPORTED by the companion
``interval_group_sizes`` helper, not silently eaten).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    start_col: str,
    end_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) within a key group whose [start, end]
    intervals overlap (closed-interval semantics: touching endpoints
    collide). Returns key cols + id_a/id_b + the overlap window and an
    ``overlap_length`` column — days for date columns, whole seconds
    for timestamps, the raw difference for numerics.

    Plan shape: a keyed self-join (shuffle on the key both sides; AQE
    can broadcast a small build side), the overlap predicate and the
    ``id_a < id_b`` dedup evaluated inside the join — one shuffle, no
    windows, no driver collection. Output is bounded by the per-key
    group size, which ``max_group_size`` enforces when hot keys exist.
    """
    base = df.select(
        *key_cols,
        F.col(id_col).alias("_id"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
    )
    if max_group_size is not None:
        sizes = base.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_gsz"))
        base = base.join(
            sizes.filter(F.col("_gsz") <= max_group_size).drop("_gsz"),
            key_cols,
            "left_semi",
        )
    a = base.select(
        *key_cols,
        F.col("_id").alias("id_a"),
        F.col("_s").alias("start_a"),
        F.col("_e").alias("end_a"),
    )
    b = base.select(
        *key_cols,
        F.col("_id").alias("id_b"),
        F.col("_s").alias("start_b"),
        F.col("_e").alias("end_b"),
    )
    ov_s = F.greatest("start_a", "start_b")
    ov_e = F.least("end_a", "end_b")
    s_dtype = dict(df.dtypes).get(start_col, "")
    if s_dtype == "date":
        length = F.datediff(ov_e, ov_s).cast("long")
    elif s_dtype.startswith("timestamp"):
        length = (F.unix_timestamp(ov_e) - F.unix_timestamp(ov_s)).cast("long")
    else:
        length = ov_e - ov_s
    return (
        a.join(b, key_cols)
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("start_a") <= F.col("end_b"))
            & (F.col("start_b") <= F.col("end_a"))
        )
        .select(
            *key_cols,
            "id_a",
            "id_b",
            ov_s.alias("overlap_start"),
            ov_e.alias("overlap_end"),
            length.alias("overlap_length"),
        )
    )


def interval_group_sizes(
    df: DataFrame,
    key_cols: list[str],
    max_group_size: int,
) -> DataFrame:
    """The audit companion to :func:`interval_overlap_pairs`'s
    ``max_group_size`` cap: the keys (with their sizes) that the cap
    DROPS — run it alongside a capped join so skipped hot keys are
    reported, never silently eaten. One count agg; output is bounded by
    the number of hot keys."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .filter(F.col("group_size") > max_group_size)
        .orderBy(*key_cols)
    )
