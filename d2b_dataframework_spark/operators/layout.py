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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a BUCKETED (hash-clustered) managed table:
    rows are hash-partitioned into ``n_buckets`` files by
    ``bucket_cols`` and optionally sorted inside each bucket.

    This is the co-located-join layout for repeated big x big joins: two
    tables bucketed by the same key into the same bucket count join with
    ZERO Exchange — the planner proves both sides already share the
    hash partitioning and goes straight to (sorted) merge join. At
    100 TB the shuffle this removes is the dominant cost of every
    fact-to-fact join; bucketing pays it ONCE at write time and
    amortizes it over every subsequent join/aggregation on the key
    (aggregations on the bucket key also skip their Exchange).

    Spark bucketing requires the table-catalog write path
    (``saveAsTable``) — plain ``.parquet(path)`` ignores bucket specs.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, on: list[str] | str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket spec
    the physical plan contains no shuffle Exchange on either side."""
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on, how)
