"""Bucketed tables: pre-shuffled storage so repeated big joins and
aggregations on the same key pay ZERO exchanges at read time.

At 100TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Writing each side ``bucketBy(N, key)`` (+ ``sortBy`` for
merge-ready runs) materializes the shuffle ONCE; every subsequent join
or groupBy on that key reads co-located buckets and Catalyst plans a
SortMergeJoin with no Exchange on either side (asserted in
tests/test_sinks.py). Pick N so a bucket of the LARGER table fits an
executor core's working set (~128-512MB compressed); both sides must
use the same N for bucket-wise co-location.

Bucketed tables go through the session catalog (``saveAsTable`` — the
bucket metadata lives in the catalog, plain ``.parquet(path)`` writes
cannot carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet
    table in the session catalog."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts the planner elides both exchanges; with ``sortBy``
    metadata it elides the sorts too."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)
