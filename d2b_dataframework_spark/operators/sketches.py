"""Mergeable-sketch operators: persistable distinct-count partials
(Apache DataSketches HLL / Theta via Spark 4 built-ins).

``approx_count_distinct`` answers one query in one pass, but its HLL++
state is internal — you cannot store today's partial and union it with
tomorrow's. The DataSketches functions (``hll_sketch_agg`` /
``hll_union_agg`` / ``theta_sketch_agg``) produce BINARY sketch columns
that a pipeline can write to parquet per day/partition and re-aggregate
later: a 100TB distinct-users-over-any-date-range query becomes a scan
over kilobyte-sized daily sketches instead of a re-scan of raw events.
Theta sketches additionally support set algebra (union via
``theta_union_agg``), which HLL cannot.

Reference parity: the reference pipelines recompute distinct counts from
raw rows on every run (e.g. d2b_data/Google_GA4.py report re-pulls);
these operators are the at-scale replacement the Spark engine adds.

All functions are JVM aggregate expressions — map-side partial combine,
no Python in the plan; the sketch state shuffled between stages is a few
KB per group regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch partials: one BINARY ``hll_sketch`` column
    per group, suitable for storing (e.g. one row per day) and merging
    later with :func:`hll_merge`. ``lg_k`` trades size for accuracy
    (relative standard error ~= 1.04 / sqrt(2^lg_k))."""
    if isinstance(keys, str):
        keys = [keys]
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll_sketch")
    )


def hll_merge(
    partials: DataFrame,
    keys: list[str] | str,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored HLL partials down to an estimate per group. The
    merge aggregates sketch state (KBs), never raw rows — this is the
    cheap leg of the two-phase distinct count."""
    if isinstance(keys, str):
        keys = [keys]
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(estimate_col)
    )


def hll_estimate(sketch: Column) -> Column:
    """Point estimate from a single sketch column (bigint)."""
    return F.hll_sketch_estimate(sketch)


def theta_partials(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group Theta sketch partials. Theta supports set algebra
    (union/intersection/difference at estimate time), so partials kept
    per segment can answer overlap questions HLL cannot."""
    if isinstance(keys, str):
        keys = [keys]
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("theta_sketch")
    )


def theta_union_estimate(
    partials: DataFrame,
    keys: list[str] | str,
    sketch_col: str = "theta_sketch",
    estimate_col: str = "distinct_estimate",
    lg_k: int = 12,
) -> DataFrame:
    """Union stored Theta partials per group and estimate distincts."""
    if isinstance(keys, str):
        keys = [keys]
    return partials.groupBy(*keys).agg(
        F.theta_sketch_estimate(
            F.theta_union_agg(F.col(sketch_col), F.lit(lg_k))
        ).alias(estimate_col)
    )


def theta_overlap(left_sketch: Column, right_sketch: Column) -> Column:
    """Estimated |A ∩ B| from two Theta sketches — the set-algebra
    capability that motivates Theta over HLL (e.g. user overlap between
    two channels from stored per-channel partials, no raw re-scan)."""
    return F.theta_sketch_estimate(
        F.theta_intersection(left_sketch, right_sketch)
    )
