"""Distributed global ranking — the scale-safe replacement for a bare
``row_number()/ntile() OVER (ORDER BY ...)``, which Spark executes by
moving EVERY row through a single partition (WindowExec warns about it).

The classic pattern instead:

1. ``repartitionByRange`` on the order keys (one range shuffle — same cost
   as a global sort, which any exact global rank needs anyway);
2. local ``row_number`` within each range partition (no cross-partition
   exchange: the window is partitioned by ``spark_partition_id``);
3. one tiny driver job collects the per-partition row counts (≤ #shuffle
   partitions integers) and broadcasts cumulative offsets back as a
   literal CASE map — global rank = offset[pid] + local rank.

The intermediate is persisted so the counts job and the downstream plan
see the SAME range partitioning (``repartitionByRange`` samples; persist
pins the outcome). The handle is tracked on the result via
``datapipe.cache.track`` — call ``datapipe.cache.release(result)`` once
consumed, like the pair-builder operators.

``ntile_from_rank`` reproduces SQL NTILE(k) arithmetic from the global
rank, so a curriculum/bucketing query keeps exact NTILE semantics without
the single-partition window.

Reference parity: the reference ranks with pandas ``rank``/``qcut`` on a
single node (e.g. d2b_data/SerpAPI.py:88-104 top-N competitor ranking);
this module is the 1000-executor equivalent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..datapipe.cache import track


def _global_row_number_with_sizes(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[int, int]]:
    """Internal: :func:`global_row_number` plus the per-partition row
    counts its one driver job already collected — callers that also
    need the TOTAL row count (``global_ntile``) read ``sum(sizes
    .values())`` instead of paying a second count job."""
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(n_part, *cols).persist()
    local_w = Window.partitionBy(F.spark_partition_id()).orderBy(*cols)
    with_local = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn", F.row_number().over(local_w)
    )
    # Tiny job: one row per partition. This is the only driver-side data.
    sizes = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr: Column = F.lit(0)
    for pid, off in offsets.items():
        if off:
            offset_expr = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(offset_expr)
    ranked = with_local.withColumn(
        rank_col, (F.col("_lrn") + offset_expr).cast("long")
    ).drop("_pid", "_lrn")
    return track(ranked, ranged), sizes


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over ``order_cols`` without a
    single-partition window.

    The range-partitioned intermediate stays persisted (the offsets were
    computed against its materialized partitioning — recomputing could
    re-sample different range bounds); it is tracked on the result for
    ``datapipe.cache.release``. ``order_cols`` must define a total order
    (add a unique tiebreaker), otherwise ranks among ties are
    partition-dependent.
    """
    ranked, _ = _global_row_number_with_sizes(df, order_cols, rank_col, num_partitions)
    return ranked


def global_rank_running_sum(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_col: str,
    rank_col: str = "rn",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number AND running sum of an integral
    ``value_col`` over a total order, without a single-partition window
    — the distributed form of
    ``row_number() OVER (ORDER BY ...)`` + ``sum(v) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``.

    Same shape as :func:`global_row_number` with one more number per
    partition in the tiny driver job: per-partition row counts AND
    value sums become broadcast literal CASE offsets, so rank and
    running total are both local-window + offset. ``order_cols`` must
    define a total order; ``value_col`` must be integral (offsets are
    carried as exact Python ints — doubles would reorder rounding).
    The range-partitioned intermediate stays persisted and is tracked
    on the result for ``datapipe.cache.release``.
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(n_part, *cols).persist()
    # Materialize the range-partition id ONCE, below the windows, and
    # partition both windows by the COLUMN: a bare spark_partition_id()
    # in the second window spec would re-evaluate AFTER the first
    # window's exchange (post-shuffle ids — with AQE coalescing, often
    # a single id), silently turning the "local" running sum global.
    pinned = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = Window.partitionBy(F.col("_pid")).orderBy(*cols)
    run_w = local_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = pinned.withColumn("_lrn", F.row_number().over(local_w)).withColumn(
        "_lcum", F.sum(F.col(value_col)).over(run_w)
    )
    # Tiny job: two numbers per partition. The only driver-side data.
    stats = {
        r["_pid"]: (int(r["c"]), int(r["s"] or 0))
        for r in ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col(value_col).cast("long")).alias("s"),
        )
        .collect()
    }
    row_off: Column = F.lit(0).cast("long")
    sum_off: Column = F.lit(0).cast("long")
    acc_rows, acc_sum = 0, 0
    for p in sorted(stats):
        if acc_rows:
            row_off = F.when(F.col("_pid") == p, F.lit(acc_rows)).otherwise(row_off)
        if acc_sum:
            sum_off = F.when(F.col("_pid") == p, F.lit(acc_sum)).otherwise(sum_off)
        c, s = stats[p]
        acc_rows += c
        acc_sum += s
    out = (
        staged.withColumn(rank_col, (F.col("_lrn") + row_off).cast("long"))
        .withColumn(cum_col, (F.col("_lcum").cast("long") + sum_off).cast("long"))
        .drop("_pid", "_lrn", "_lcum")
    )
    return track(out, ranged)


def ntile_from_rank(rank: Column | str, total: Column | str, k: int) -> Column:
    """SQL ``NTILE(k)`` from a precomputed 1-based global rank and total
    row count: the first ``total % k`` buckets hold ``ceil(total/k)`` rows,
    the rest ``floor(total/k)`` — identical tie/placement semantics to the
    window function, evaluated map-side.
    """
    rn = F.col(rank) if isinstance(rank, str) else rank
    n = (F.col(total) if isinstance(total, str) else total).cast("long")
    base = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    big = base + 1  # size of the first `rem` buckets
    cutoff = rem * big  # ranks ≤ cutoff fall in the big buckets
    in_big = F.ceil(rn.cast("double") / big.cast("double")).cast("long")
    in_small = (rem + F.ceil((rn - cutoff).cast("double") / base.cast("double"))).cast(
        "long"
    )
    return F.when(base == 0, in_big).when(rn <= cutoff, in_big).otherwise(in_small)


def global_ntile(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    k: int,
    phase_col: str = "phase",
) -> DataFrame:
    """NTILE(k) over a global ordering, distributed. The persisted
    intermediate is tracked for ``datapipe.cache.release``.
    """
    ranked, sizes = _global_row_number_with_sizes(df, order_cols, rank_col="_grn")
    # Total row count from the sizes the rank pass already collected —
    # the old ranked.count() here was a whole extra job per call
    # (guide §1.2: per-call driver jobs are pure overhead at any scale).
    total = sum(sizes.values())
    out = ranked.withColumn(
        phase_col, ntile_from_rank(F.col("_grn"), F.lit(total), k).cast("long")
    ).drop("_grn")
    return track(out, *getattr(ranked, "_d2b_persisted", ()))


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline): rows not dominated by any
    other, where domination means x' <= x AND y' >= y with at least one
    strict (x is minimized, y maximized — flip signs upstream for other
    orientations). Equal (x, y) points never dominate each other, so
    ties all survive.

    Distributed scan shape (same pattern as :func:`global_row_number` —
    never a single-partition window over the data):

    1. reduce to the per-x maximum y (a dominated-within-column drop);
    2. range-partition by x; local running-max of y within partitions;
    3. one tiny driver job collects the per-partition y maxima and
       broadcasts prefix maxima back as a literal CASE — a point
       survives iff its y strictly exceeds every y at smaller x
       (local running max OR earlier partitions' prefix max);
    4. join survivors back on (x, y) to recover ALL frontier rows.

    The frontier intermediate is |distinct x| rows at most; the only
    driver-side data is one number per shuffle partition.
    """
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    x, y = F.col(x_col), F.col(y_col)
    best = df.groupBy(x_col).agg(F.max(y).alias("_ymax"))
    ranged = best.repartitionByRange(n_part, x.asc()).persist()
    pid = F.spark_partition_id()
    local_w = (
        Window.partitionBy(pid)
        .orderBy(x.asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = ranged.withColumn("_pid", pid).withColumn(
        "_prev_local", F.max(F.col("_ymax")).over(local_w)
    )
    # Tiny job: per-partition max y (≤ n_part rows to the driver).
    part_max = {
        r["_pid"]: r["m"]
        for r in ranged.groupBy(pid.alias("_pid"))
        .agg(F.max("_ymax").alias("m"))
        .collect()
    }
    prefix: Column = F.lit(None).cast("double")
    running = None
    for p in sorted(part_max):
        if running is not None:
            prefix = F.when(F.col("_pid") == p, F.lit(running)).otherwise(prefix)
        m = part_max[p]
        running = m if running is None or m > running else running
    prev = F.greatest(
        F.coalesce(F.col("_prev_local").cast("double"), F.lit(float("-inf"))),
        F.coalesce(prefix, F.lit(float("-inf"))),
    )
    frontier_pts = staged.filter(F.col("_ymax").cast("double") > prev).select(
        x_col, F.col("_ymax").alias(y_col)
    )
    # Plain (not forced-broadcast) semi-join: a typical frontier is tiny
    # (O(log n) for independent dims) and AQE broadcasts it at runtime,
    # but an adversarial input can put every point on the frontier — the
    # shuffle join must stay available for that case.
    out = df.join(frontier_pts, [x_col, y_col], "left_semi")
    return track(out, ranged)
