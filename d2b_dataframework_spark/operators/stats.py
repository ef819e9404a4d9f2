"""ANALYZE-style column statistics in ONE aggregation pass.

The production profile of a 100 TB table must be a single scan:
``column_stats`` computes row count, per-column null counts, min/max,
and NDV in one ``agg`` — no explode, no per-column jobs, no second
pass. NDV modes:

* ``"approx"`` (default): native ``approx_count_distinct`` (HLL++ in
  the JVM aggregate — map-side partials, a few KB of state per
  column). This is the at-scale default; its estimate is
  implementation-specific, so it is verified by tolerance tests, not
  the cross-engine oracle.
* ``"exact"``: ``count_distinct`` per column in the same single agg
  (Catalyst plans multiple distinct aggregates via one Expand — still
  one logical pass, but the expanded shuffle is ~n_cols x the table:
  use only when exact NDV is genuinely required).

For an ORACLE-matchable approximate NDV (same estimate on any engine),
see operators/ndv_sketch.py — the deterministic HLL the registered
``table_stats_approx`` query uses. For mergeable/persistable NDV state,
see operators/sketches.py.

Reference parity: the reference profiles frames with pandas
``describe()``/``nunique()`` full-frame recomputation (e.g. notebook
flows around d2b_data/README.md pipelines); this operator is the
at-scale replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    ndv: str = "approx",
    rsd: float = 0.05,
) -> DataFrame:
    """One row per column: (column, n_nulls, ndv, min_str, max_str,
    n_rows). min/max render as strings so heterogeneous column types
    coexist in one frame. ``rsd`` is the approx-NDV relative standard
    deviation (approx mode only).

    Plan shape: ONE Aggregate over the scan (verified in tests: a
    single Exchange for the final 1-row combine), then a constant-fold
    ``stack`` to long form — the per-column rows never touch the data
    again.
    """
    if ndv not in ("approx", "exact"):
        raise ValueError(f"ndv must be 'approx' or 'exact', got {ndv!r}")
    cols = cols or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).cast("long").alias("_total")]
    for c in cols:
        col = F.col(c)
        ndv_expr = (
            F.approx_count_distinct(c, rsd=rsd)
            if ndv == "approx"
            else F.count_distinct(col)
        )
        aggs += [
            F.sum(col.isNull().cast("long")).cast("long").alias(f"_nulls_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
            ndv_expr.cast("long").alias(f"_ndv_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_nulls_{c}"),
            F.col(f"_ndv_{c}"),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
        ]
    return row.select(
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "column", "n_nulls", "ndv", "min_str", "max_str"
        ),
        F.col("_total").alias("n_rows"),
    )
