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


def histogram_partials(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 1000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Mergeable fixed-width histogram sketch: ``bins`` int64 counters
    over [lo, hi) (values at/above ``hi`` clamp into the last bin, below
    ``lo`` into the first). Counts are EXACT integers, so partials from
    different days/shards merge by plain addition in any order — the
    quantile analog of the HLL partials above: store one (keys, bin,
    n) frame per day, re-aggregate over any date range without
    re-scanning raw data.

    Returns (keys..., bin: int, n: long) — only non-empty bins, at most
    ``bins`` rows per group shuffled regardless of input size.

    Bin arithmetic is plain IEEE double with fixed parenthesization
    (``floor((v - lo) / (hi - lo) * bins)``), reproducible on any
    engine; nulls are dropped.
    """
    keys = keys or []
    span = hi - lo
    raw = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(lo)))
        / F.lit(float(span))
        * F.lit(float(bins))
    )
    bin_c = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bin_c.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
    keys: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram sketch (linear interpolation
    inside the winning bin — the classic mergeable-histogram readout).
    Error contract: the estimate lands in the bin holding the
    ceil(q*N)-th order statistic, so it is within ONE BIN WIDTH of the
    step-CDF quantile (property-tested); an INTERPOLATED quantile can
    additionally sit mid-gap between distant values, where no histogram
    can be closer than the gap. For each q in ``qs`` the estimate is

        lo + (bin + (target - cum_before) / bin_n) * width

    with ``target = q * total`` (a double; comparisons against exact
    integer cumulative counts are reproducible cross-engine).

    ``hist`` is the output of :func:`histogram_partials` (possibly
    unioned across shards and re-summed by the caller). Returns
    (keys..., q: double, est: double). The window runs over at most
    ``bins`` rows per group — driver-scale, never data-scale.
    """
    from pyspark.sql import Window

    keys = keys or []
    width = (hi - lo) / bins
    merged = hist.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bin")
    cum = merged.select(
        *keys,
        "bin",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("cum_before"),
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    )
    out = None
    for q in qs:
        target = F.lit(float(q)) * F.col("total")
        # winning bin: the unique non-empty bin with cum_before < target
        # <= cum_before + n (boundary ties resolve to the earlier bin on
        # both engines via the <=; q > 0 and total > 0 imply target > 0,
        # so exactly one bin qualifies).
        hit = cum.filter(F.col("cum_before") < target).filter(
            target <= F.col("cum_before") + F.col("n")
        )
        est = hit.groupBy(*keys).agg(
            F.min(
                F.lit(float(lo))
                + (
                    F.col("bin").cast("double")
                    + (target - F.col("cum_before")) / F.col("n")
                )
                * F.lit(float(width))
            ).alias("est")
        )
        labeled = est.select(*keys, F.lit(float(q)).alias("q"), F.round("est", 6).alias("est"))
        out = labeled if out is None else out.unionByName(labeled)
    return out


def _cms_bucket(i: int, key: Column, w: int) -> Column:
    """Row-``i`` bucket for ``key``: md5-prefix hash (the engine's
    portable 60-bit hash convention, see operators/ndv_sketch.py) mod
    ``w``. Deterministic on any engine with md5."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(w)).cast("int")


def _cms_cells(
    df: DataFrame, key_col: str, d: int, w: int, keys: list[str] | None = None
) -> DataFrame:
    """(keys..., key_col?, row, bucket) cell coordinates for every input
    row — the ONE place the d-row hash expansion lives, shared by build
    and probe so their cell shapes cannot drift apart ("d/w must match
    the build" is the critical invariant)."""
    key = F.col(key_col)
    carried = [*(keys or [])] if keys is not None else [key_col]
    return df.select(
        *carried,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_bucket(i, key, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_c"),
    ).select(*carried, "_c.row", "_c.bucket")


def cms_partials(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    keys: list[str] | None = None,
) -> DataFrame:
    """Mergeable count-min sketch: ``d`` independent hash rows of ``w``
    exact int64 counters. Answers "how often did key X occur?" over any
    union of stored partials WITHOUT keeping per-key state: at most
    ``d*w`` rows per (group, shard) regardless of key cardinality — the
    frequency analog of the HLL partial store (billions of distinct
    user-ids/URLs become a fixed few-KB table per day).

    Estimates via :func:`cms_estimate` are biased UP only (collisions
    add, never subtract): est >= true, with the min over ``d`` rows
    taming the overcount. Hashing is the md5-prefix convention —
    deterministic cross-engine, so estimates are oracle-matchable.

    Returns (keys..., row: int, bucket: int, n: long), non-empty cells
    only. Merge = unionByName + re-sum (plain integer addition, any
    order).
    """
    keys = keys or []
    cells = _cms_cells(df.filter(F.col(key_col).isNotNull()), key_col, d, w, keys)
    return cells.groupBy(*keys, "row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-estimate counts for every key in ``probes`` (small frame,
    broadcast) against a count-min sketch (possibly a re-summed union of
    shards): est = min over the ``d`` rows of the counter at that key's
    bucket; a never-incremented bucket reads 0 (and that zero wins the
    min — keys absent from the sketch estimate 0 unless they collide in
    EVERY row).

    ``d``/``w`` must match the build. Returns probes + (est: long).
    """
    merged = cms.groupBy("row", "bucket").agg(F.sum("n").alias("n"))
    probe_cells = _cms_cells(probes, key_col, d, w, keys=None)
    # LEFT join from the probe cells: a probe bucket the sketch never
    # incremented reads 0, and that 0 MUST participate in the min — an
    # inner join would drop empty cells and report the colliding rows'
    # counts instead (overestimating keys absent from the sketch).
    # Broadcast the SKETCH side: ``merged`` is at most d*w kilobyte-scale
    # cells regardless of data volume, and Spark cannot build a broadcast
    # of the left (outer) side of a left join — hinting probe_cells would
    # be silently ignored and fall back to a shuffle.
    hits = probe_cells.join(F.broadcast(merged), ["row", "bucket"], "left")
    est = hits.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("_est")
    )
    return probes.join(est, key_col, "left").select(
        *probes.columns, F.coalesce(F.col("_est"), F.lit(0)).cast("long").alias("est")
    )


def cms_join_size_estimate(
    cms_a: DataFrame,
    cms_b: DataFrame,
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    on the join key (same d/w): for each hash row, the inner product
    sum_b(a[r][b] * b[r][b]) equals |A join B| plus non-negative
    collision mass, so the MIN over rows is the standard upward-biased
    estimator (Cormode-Muthukrishnan) — the join-size oracle a planner
    consults without scanning either side: two kilobyte sketch tables
    in, one number out.

    Returns one row: (est: long). Exact integer arithmetic throughout
    (counter products summed as int64), so the estimate reproduces on
    any engine.
    """
    a = cms_a.groupBy("row", "bucket").agg(F.sum("n").alias("na"))
    b = cms_b.groupBy("row", "bucket").agg(F.sum("n").alias("nb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("ip"))
    )
    # A hash row whose buckets never overlap has inner product 0 — and 0
    # must win the min (disjoint key sets estimate 0, not null): anchor
    # on the sketch's row spine and fill absent rows.
    rows = a.select("row").distinct()
    est = rows.join(per_row, "row", "left").agg(
        F.min(F.coalesce(F.col("ip"), F.lit(0))).alias("_min_ip")
    )
    # an EMPTY A-side sketch leaves the row spine empty and min() null —
    # the true join size is 0 there too, same as the disjoint-key case
    return est.select(
        F.coalesce(F.col("_min_ip"), F.lit(0)).cast("long").alias("est")
    )
