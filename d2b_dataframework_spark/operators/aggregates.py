"""Aggregation operators beyond plain groupBy: skew-safe salted
aggregation and exact/approx percentile helpers.

Skew is the #1 cause of 100TB agg failures: one hot key (one event
type, one celebrity doc) lands an entire reduce partition on one
executor. ``salted_sum`` splits every key into ``buckets`` sub-keys for
the first (wide) aggregation, then combines the per-salt partials in a
second (tiny) aggregation — the classic two-stage rewrite. Spark's AQE
skew handling covers *joins*; aggregation skew still needs the salt
when partial (map-side) combine alone can't absorb it (e.g. high
cardinality per partition or decimal sums over many distinct groups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation. ``aggs`` maps output column name
    to a SUM-able column expression (sums and counts re-aggregate
    exactly; avg must be expressed as sum+count and divided after).

    The salt is ``xxhash64`` of the whole row mod ``buckets`` — any
    distribution works (stage 2 re-combines exactly), a hash of row
    content just avoids RNG non-determinism in tests/retries. Stage 1
    shuffles on (keys..., salt) — hot keys fan out over ``buckets``
    reducers; stage 2 shuffles at most ``|groups| * buckets`` partial
    rows, negligible at any scale.
    """
    if isinstance(keys, str):
        keys = [keys]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[F.sum(expr).alias(name) for name, expr in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def exact_percentiles(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    percentiles: list[float],
    prefix: str = "p",
) -> DataFrame:
    """Exact continuous-interpolation percentiles per group (the ANSI
    PERCENTILE_CONT definition — matches DuckDB ``quantile_cont``).

    Exact percentile materializes each group's values; use it on
    bounded groups (per-type, per-day). For 100TB raw streams use
    ``F.approx_percentile`` (t-digest sketch, map-side mergeable) —
    approximate results can't be oracle-matched, so the exact form is
    what the registry verifies.
    """
    if isinstance(keys, str):
        keys = [keys]
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(q)), 6).alias(
            f"{prefix}{int(q * 100)}"
        )
        for q in percentiles
    ]
    return df.groupBy(*keys).agg(*aggs)
