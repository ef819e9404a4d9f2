"""Join-strategy advisor: the planning step a 100 TB pipeline runs
BEFORE submitting a join — exact key-level statistics reduced to the
physical-strategy decision (broadcast / shuffle / shuffle+salt) that
operators elsewhere in this engine implement (operators/joins.py
broadcast_dim_join, the salted-join queries).

One aggregation pass per side: per-key counts give build size, probe
NDV, the exact inner-join cardinality (sum over keys of
probe_count * build_count — the product form CMS join-size estimation
approximates; here keys are aggregated so it is exact at key-level
cost, not row-level), and the probe's hottest-key share — the skew
signal that decides salting. All integer/double arithmetic with fixed
rounding, so a SQL oracle replays the recommendation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_advice(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    label: str = "join",
    broadcast_limit_rows: int = 10_000,
    skew_share: float = 0.0003,
) -> DataFrame:
    """One-row advice frame for probe ⋈ build on the given keys:
    (candidate, build_rows, probe_rows, probe_ndv, top_share,
    est_join_rows, recommendation).

    Decision order mirrors what a planner should try first: broadcast
    when the build side is tiny (no shuffle at all), otherwise salt when
    one probe key owns more than ``skew_share`` of the rows (a single
    reducer would own that key's entire partition), otherwise a plain
    shuffle join.
    """
    bk = build_key or probe_key
    pc = probe.groupBy(F.col(probe_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_pc")
    )
    bc = build.groupBy(F.col(bk).alias("_k")).agg(
        F.count(F.lit(1)).alias("_bc")
    )
    stats = pc.join(bc, "_k", "full").agg(
        F.sum("_bc").cast("long").alias("build_rows"),
        F.sum("_pc").cast("long").alias("probe_rows"),
        F.count(F.when(F.col("_pc").isNotNull(), 1)).cast("long").alias(
            "probe_ndv"
        ),
        F.max("_pc").cast("long").alias("_top"),
        F.sum(
            F.coalesce(F.col("_pc"), F.lit(0)) * F.coalesce(F.col("_bc"), F.lit(0))
        ).cast("long").alias("est_join_rows"),
    )
    top_share = F.round(
        F.col("_top").cast("double") / F.col("probe_rows").cast("double"), 6
    )
    rec = (
        F.when(F.col("build_rows") <= broadcast_limit_rows, F.lit("broadcast"))
        .when(top_share > skew_share, F.lit("shuffle+salt"))
        .otherwise(F.lit("shuffle"))
    )
    return stats.select(
        F.lit(label).alias("candidate"),
        "build_rows",
        "probe_rows",
        "probe_ndv",
        top_share.alias("top_share"),
        "est_join_rows",
        rec.alias("recommendation"),
    )
