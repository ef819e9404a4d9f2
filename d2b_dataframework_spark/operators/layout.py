"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional data skipping.

A 100TB table pruned on ONE column only needs that column's partition /
sort order; pruned on TWO (customer × date, tenant × time) it needs a
space-filling curve: Z-ordering interleaves the bits of both keys so a
range-partition on the Z-value keeps rows close in BOTH dimensions
inside each file — min/max column stats on the files then prune scans
on either predicate (the same layout trick Delta's OPTIMIZE ZORDER and
Hudi clustering apply).

Everything here is integer bit arithmetic (shift/and) — exact on any
engine, whole-stage-codegen'd in Spark, and the write path is just
``repartitionByRange(zorder_value(...))`` + the engine's partitioned
sink. ``zorder_sql`` emits the equivalent ANSI expression so the oracle
stays in lock-step with the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton code of two non-negative ints using ``bits`` bits each:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_sql(x: str, y: str, bits: int = 10) -> str:
    """The ANSI-SQL twin of :func:`zorder_value` (DuckDB/BigQuery
    dialects share ``>> & <<``), for oracle parity checks."""
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_file_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 10,
    file_shift: int = 10,
) -> DataFrame:
    """Assign every row a Z-value and a target file id (``z >>
    file_shift`` — contiguous Z-ranges per file, what a range
    repartition on z materializes), then report per-file min/max stats
    on both dimensions — the exact numbers a scan planner would prune
    with. Tight per-file ranges on BOTH x and y = the layout works.
    """
    z = zorder_value(x, y, bits)
    return (
        df.select(
            x.alias("_x"), y.alias("_y"), z.alias("_z")
        )
        .groupBy(F.shiftright(F.col("_z"), file_shift).cast("long").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_x").cast("long").alias("x_min"),
            F.max("_x").cast("long").alias("x_max"),
            F.min("_y").cast("long").alias("y_min"),
            F.max("_y").cast("long").alias("y_max"),
        )
    )

