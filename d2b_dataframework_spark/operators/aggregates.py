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

from pyspark.sql import Column, DataFrame, Window
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


def key_skew_stats(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnostic: per-key counts reduced to the
    numbers that decide a salting strategy — max/mean ratio, share of
    rows on the hottest key, and the top-N keys themselves.

    One word-count shuffle (map-side combine) + a tiny top-N sort; run
    it on a join key BEFORE shipping the join at 100TB. Rule of thumb
    the engine's salted_sum docstring uses: max/mean > ~#partitions
    means a single reducer owns the key — salt it or let AQE split it.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    # Scale-safe top-N: orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition partial top-N, merged once) — a bare row_number window
    # here would drag EVERY distinct key through a single partition. Rank is
    # assigned after the limit, over at most top_n rows.
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(top_n)
    w = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(stats))
        .select(
            "rank",
            F.col(key_col).cast("string").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.round(
                F.col("max_n").cast("double")
                / (F.col("n_rows").cast("double") / F.col("n_keys").cast("double")),
                6,
            ).alias("max_over_mean"),
            F.round(F.col("n").cast("double") / F.col("n_rows").cast("double"), 6).alias(
                "row_share"
            ),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Table-version diff: classify every key as ``added`` / ``removed``
    / ``changed`` / ``unchanged`` by comparing a row hash of the tracked
    columns across a full outer join on the key.

    The regression-audit primitive for daily warehouse loads: one
    co-partitioned join (bucket both snapshots by key and it is
    shuffle-free), row hashes computed map-side, output is keys +
    status only — never wide rows.
    """
    def hashed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key_col),
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in compare_cols])).alias(
                f"h_{side}"
            ),
        )

    return (
        hashed(old, "old")
        .join(hashed(new, "new"), key_col, "full_outer")
        .select(
            key_col,
            F.when(F.col("h_old").isNull(), "added")
            .when(F.col("h_new").isNull(), "removed")
            .when(F.col("h_old") != F.col("h_new"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
    )


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
    pre_salt: int = 0,
    salt_on: Column | str | None = None,
) -> DataFrame:
    """Exact per-group top-k via a window partitioned on the group keys.

    With many groups the window is fully parallel. With FEW groups (a
    handful of segments over billions of rows) every row funnels into
    |groups| reduce partitions — pass ``pre_salt=n`` to run a two-stage
    exact top-k instead: stage 1 ranks within (key, salt) cells — n×
    the parallelism — and keeps each cell's top-k (a superset of the
    final top-k by a pigeonhole argument: the true i-th best of a group
    is at worst i-th in its own cell); stage 2 re-ranks only the ≤ n·k
    survivors per group. The salt is a deterministic hash of ``salt_on``
    (a unique row id), so results never depend on partition layout.
    """
    final_w = Window.partitionBy(*keys).orderBy(*order_cols)
    pruned = df
    if pre_salt > 1:
        if salt_on is None:
            raise ValueError("pre_salt requires salt_on (a unique row-id column)")
        tb = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt = F.pmod(F.hash(tb), F.lit(int(pre_salt)))
        cell_w = Window.partitionBy(*keys, salt).orderBy(*order_cols)
        pruned = (
            df.withColumn("_cr", F.row_number().over(cell_w))
            .filter(F.col("_cr") <= k)
            .drop("_cr")
        )
    return (
        pruned.withColumn(rank_col, F.row_number().over(final_w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
