"""As-of (point-in-time) join: each left row matches the latest right
row with the same key whose timestamp is <= the left timestamp.

The reference joins API extracts to the freshest prior snapshot by
sorting in pandas (d2b_data/Alodesk_API.py:29-44's keep-latest is the
degenerate "as of now" case); a distributed engine needs a real as-of.

Scale design — the union-sort forward-fill formulation:

* The naive formulation (``left JOIN right ON key AND r.ts <= l.ts``
  + keep max r.ts) is a non-equi join: Spark plans it as
  BroadcastNestedLoop or a sort-merge with per-row range scans, and the
  intermediate is |left| x |matching right| rows. Unusable at 100TB.
* Instead: tag both sides, union by name, ONE shuffle on the key, ONE
  sort on (ts, side), then ``last(right_payload, ignorenulls=True)``
  over an unbounded-preceding window forward-fills the most recent
  right payload onto every left row. Cost is a single exchange + sort
  regardless of match fan-out — the same shape Flink/kdb use for as-of.
* Right rows sort BEFORE left rows on timestamp ties (side 0 < 1), so
  an exactly-equal timestamp matches — the usual as-of convention
  (DuckDB ``ASOF JOIN`` with ``>=`` agrees).

The right side must be unique per (key, ts); pre-dedup with
``operators.dedup.keep_latest`` or pass ``dedup_tiebreaker`` to make
this function pick the winner deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    dedup_tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join. Returns every left row plus ``right_cols`` (and
    ``right_ts``) from the freshest right row at-or-before the left
    timestamp; NULLs when no prior right row exists.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = [right_ts, *right_cols]

    r = right
    if dedup_tiebreaker is not None:
        w = Window.partitionBy(on, right_ts).orderBy(F.col(dedup_tiebreaker).desc())
        r = (
            r.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    r_tagged = r.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(r_tagged.schema["_payload"].dataType)
        .alias("_payload"),
        "*",
    )

    both = l_tagged.unionByName(r_tagged)
    fill = Window.partitionBy("_k").orderBy("_ts", "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = both.withColumn("_match", F.last("_payload", ignorenulls=True).over(fill))
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col(f.name) for f in left.schema.fields],
        *[F.col("_match")[c].alias(c) for c in payload],
    )
    return out
