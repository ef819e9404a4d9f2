"""Distributed descriptive statistics with cross-engine-exact results.

``DataFrame.stat.corr`` (and any naive double-sum implementation) is
order-dependent — per-partition float accumulation makes the last few
ulps a function of the partitioning, so results differ run-to-run and
engine-to-engine. Here every moment (Σx, Σx², Σxy) is accumulated in
DECIMAL — exact and order-independent — and the Pearson formula is
evaluated ONCE on the final sums in fixed-parenthesization double math,
making the output bit-reproducible on any cluster layout AND matchable
by the DuckDB oracle.

One aggregation pass computes all moments for all requested column
pairs (conditional projections inside a single agg — never one scan per
pair); the result is a single row stacked into tidy (metric_x,
metric_y, corr) rows. Scale cost: one map-side-combining agg over the
table, output O(|cols|²) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,4)")


def pairwise_pearson(
    df: DataFrame, cols: list[str], decimals: int = 6
) -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols`` in one
    pass. Returns (metric_x, metric_y, corr, n_rows)."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for c in cols:
        aggs.append(F.sum(_dec(c)).cast("double").alias(f"_s_{c}"))
        aggs.append(F.sum(_dec(c) * _dec(c)).cast("double").alias(f"_ss_{c}"))
    for a, b in pairs:
        aggs.append(F.sum(_dec(a) * _dec(b)).cast("double").alias(f"_sp_{a}_{b}"))
    row = df.agg(*aggs)

    stack_args: list[Column] = []
    for a, b in pairs:
        n, sp = F.col("_n"), F.col(f"_sp_{a}_{b}")
        sa, sb = F.col(f"_s_{a}"), F.col(f"_s_{b}")
        ssa, ssb = F.col(f"_ss_{a}"), F.col(f"_ss_{b}")
        corr = (n * sp - sa * sb) / F.sqrt(
            (n * ssa - sa * sa) * (n * ssb - sb * sb)
        )
        stack_args += [F.lit(a), F.lit(b), F.round(corr, decimals)]
    return row.select(
        F.stack(F.lit(len(pairs)), *stack_args).alias("metric_x", "metric_y", "corr"),
        F.col("_n").cast("long").alias("n_rows"),
    )


def pearson_sql(table: str, cols: list[str], decimals: int = 6) -> str:
    """The DuckDB twin of :func:`pairwise_pearson` — generated from the
    same pair list so formula and parenthesization stay in lock-step.

    Operands widen to DECIMAL(19,4): DuckDB stores DECIMAL(≤18) in
    int64, so an 18×18 product overflows the physical type; width 19
    forces int128 and the product is an exact DECIMAL(38,8) — the same
    values Spark's DECIMAL(18,4) × DECIMAL(18,4) → DECIMAL(37,8) holds."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    d = lambda c: f"CAST({c} AS DECIMAL(19,4))"  # noqa: E731
    sums = ["count(*)::DOUBLE AS n"]
    for c in cols:
        sums.append(f"CAST(SUM({d(c)}) AS DOUBLE) AS s_{c}")
        sums.append(f"CAST(SUM({d(c)} * {d(c)}) AS DOUBLE) AS ss_{c}")
    for a, b in pairs:
        sums.append(f"CAST(SUM({d(a)} * {d(b)}) AS DOUBLE) AS sp_{a}_{b}")
    rows = []
    for a, b in pairs:
        corr = (
            f"round((n * sp_{a}_{b} - s_{a} * s_{b}) / "
            f"sqrt((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})), {decimals})"
        )
        rows.append(
            f"SELECT '{a}' AS metric_x, '{b}' AS metric_y, {corr} AS corr, n::BIGINT AS n_rows FROM m"
        )
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM {table})\n"
        + "\nUNION ALL ".join(rows)
    )


def zscore_normalize(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-group z-score feature scaling: (x - mean) / stddev, with the
    moments accumulated in DECIMAL (exact, partition-independent) and
    the final math in fixed-parenthesization double.

    Population stddev (÷n) — matches the formula a feature-scaling
    pipeline fits once and applies everywhere. One agg pass over the
    table + one broadcast-back join on the (small) group key set; zero
    variance → null score. At 100TB: the moments frame is |groups| rows
    — broadcast; the normalization itself is a map-side projection.
    """
    keys = by or []
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for c in cols:
        aggs.append(F.sum(_dec(c)).cast("double").alias(f"_s_{c}"))
        aggs.append(F.sum(_dec(c) * _dec(c)).cast("double").alias(f"_ss_{c}"))
    moments = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    joined = (
        df.join(F.broadcast(moments), keys) if keys else df.crossJoin(F.broadcast(moments))
    )
    out_cols = []
    for c in cols:
        n, s, ss = F.col("_n"), F.col(f"_s_{c}"), F.col(f"_ss_{c}")
        mean = s / n
        var = (ss / n) - (mean * mean)
        z = (F.col(c).cast("double") - mean) / F.sqrt(var)
        out_cols.append(
            F.when(var > 0, F.round(z, decimals)).otherwise(F.lit(None)).alias(f"{c}_z")
        )
    return joined.select(*df.columns, *out_cols)


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    ndv: str = "approx",
    rsd: float = 0.05,
) -> DataFrame:
    """ANALYZE-style column profile in ONE aggregation pass: one row per
    column, (column, n_nulls, ndv, min_str, max_str, n_rows). min/max
    render as strings so heterogeneous column types coexist in one
    frame. ``rsd`` is the approx-NDV relative standard deviation.

    NDV modes: ``"approx"`` (default, the at-scale path) uses the native
    ``approx_count_distinct`` JVM aggregate — HLL++ map-side partials, a
    few KB of state per column, verified by tolerance tests (its
    estimate is implementation-specific, so no cross-engine oracle);
    ``"exact"`` opts into ``count_distinct``'s Expand (~n_cols x the
    table shuffled) when exact NDV is genuinely required. For an
    ORACLE-matchable approximate NDV see operators/ndv_sketch.py; for
    mergeable/persistable NDV state see operators/sketches.py.

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


def grouped_linreg(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group OLS line fit (slope/intercept/r2) from moment sums in
    ONE aggregation pass — the trend-per-series primitive (metric drift
    per segment, price trend per part, engagement slope per channel).

    Same determinism contract as :func:`pairwise_pearson`: Σx, Σy, Σxy,
    Σx², Σy² accumulate in DECIMAL (exact, order/partition-independent),
    the closed forms evaluate once per group in fixed-parenthesization
    double math. Degenerate groups (zero x-variance) return null slope/
    intercept/r2 rather than ±inf.

    Returns (keys..., n_rows, slope, intercept, r2).
    """
    x, y = _dec(x_col), _dec(y_col)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).cast("double").alias("_sx"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum(x * y).cast("double").alias("_sxy"),
        F.sum(x * x).cast("double").alias("_sxx"),
        F.sum(y * y).cast("double").alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    intercept = (sy - slope * sx) / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    guard = var_x > 0
    return agg.select(
        *keys,
        n.cast("long").alias("n_rows"),
        F.when(guard, F.round(slope, decimals)).alias("slope"),
        F.when(guard, F.round(intercept, decimals)).alias("intercept"),
        F.when(guard & (var_y > 0), F.round(r2, decimals)).alias("r2"),
    )


# Poisson(1) CDF thresholds for the deterministic bootstrap: a uniform
# u in [0,1) maps to the smallest k with u < P(X <= k). Written as the
# exact double literals both engines parse identically.
_POISSON1_CDF: tuple[float, ...] = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def poisson_bootstrap_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_reps: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Per-group bootstrap replicate means via the DETERMINISTIC Poisson
    bootstrap: replicate ``b`` weights each row by a Poisson(1) draw
    derived from md5(salt:b:id) — the standard one-pass approximation
    of resampling-with-replacement at scale (Poisson(1) counts converge
    to multinomial resampling for large n; no shuffle of the raw data,
    no per-replicate scan).

    Scale shape: the replicate dimension fans out map-side (explode of
    ``n_reps`` weights per row) and collapses in the SAME partial
    aggregation, so the exchange carries groups x n_reps partial sums —
    never n_reps copies of the data. Weighted sums are exact DECIMAL;
    the mean divides once in double and rounds to 6 (the engine's
    cross-engine convention). Hash is the portable md5-prefix (28-bit)
    so replicate weights — and therefore every statistic downstream —
    reproduce bit-identically on any engine with md5.

    Returns (group_col, rep: int, rep_mean: double, n_eff: long) — one
    row per (group, replicate) with sum(weight) > 0.
    """
    # One md5 yields FOUR independent 28-bit uniforms (the 32-hex
    # digest splits into two 14-hex halves, each a 56-bit long carrying
    # two 28-bit windows), so replicate b reads shift-window b % 2 of
    # conv-half (b % 4) div 2 of md5(salt : b div 4 : id) — 4x fewer
    # digests and 2x fewer hex decodes than one digest per replicate,
    # same reproducibility contract (the oracle replays the windowing).
    #
    # NO replicate explode: fanning each row out n_reps times was the
    # dominant measured cost. Every replicate is instead a COLUMN PAIR
    # in ONE aggregation pass — groups x 2 x n_reps partial sums cross
    # the wire — and the tiny per-group result unpivots via stack().
    # Money rides as LONG CENTS (integer sums are exact, and
    # sum_cents/100.0 rounds the same rational to the same double as
    # the oracle's decimal sum). All hot expressions are built as ONE
    # selectExpr batch: assembling 64 nested-CASE Column trees through
    # py4j cost ~4 s of DRIVER time alone (measured), while a parsed
    # SQL string is one round-trip.
    n_digests = (n_reps + 3) // 4
    n_convs = (n_reps + 1) // 2
    # NULL values drop out of sum(w * _v) but would still count into
    # n_eff = sum(w); exclude them up front so both terms see the same
    # row set (a NULL measurement is "not observed", not "observed 0").
    df = df.filter(F.col(value_col).isNotNull())
    digs = df.select(
        group_col,
        (F.col(value_col).cast("decimal(18,2)") * 100).cast("long").alias("_v"),
        *[
            F.md5(F.concat(F.lit(f"{salt}:{g}:"), F.col(id_col).cast("string"))).alias(
                f"_h{g}"
            )
            for g in range(n_digests)
        ],
    )
    # On under-split local inputs (one parquet file = one task) this
    # operator is CPU-bound on a single core; spread it. Gated so a
    # well-partitioned 100 TB input never pays an extra shuffle.
    target = df.sparkSession.sparkContext.defaultParallelism
    if digs.rdd.getNumPartitions() < max(2, target // 2):
        digs = digs.repartition(target)
    convs = digs.selectExpr(
        group_col,
        "_v",
        *[
            f"cast(conv(substr(_h{j // 2}, {1 + 14 * (j % 2)}, 14), 16, 10)"
            f" as bigint) as _c{j}"
            for j in range(n_convs)
        ],
    )

    def wt_sql(b: int) -> str:
        u = (
            f"(cast((shiftrightunsigned(_c{b // 2}, {28 * (b % 2)})"
            f" & 268435455) as double) / 268435456.0)"
        )
        expr = str(len(_POISSON1_CDF))
        for k in range(len(_POISSON1_CDF) - 1, -1, -1):
            expr = f"if({u} < {_POISSON1_CDF[k]!r}, {k}, {expr})"
        return expr

    agg_exprs = []
    for b in range(n_reps):
        w = wt_sql(b)
        agg_exprs.append(f"sum(cast({w} as bigint) * _v) as _ws{b}")
        agg_exprs.append(f"cast(sum({w}) as bigint) as _n{b}")
    per_group = convs.groupBy(group_col).agg(
        *[F.expr(e) for e in agg_exprs]
    )
    stack_parts = ", ".join(f"{b}, _ws{b}, _n{b}" for b in range(n_reps))
    agg = per_group.selectExpr(
        group_col,
        f"stack({n_reps}, {stack_parts}) as (rep, _ws, _n)",
    )
    return agg.filter(F.col("_n") > 0).select(
        group_col,
        F.col("rep").cast("int").alias("rep"),
        F.round(
            (F.col("_ws").cast("double") / F.lit(100.0)) / F.col("_n").cast("double"),
            6,
        ).alias("rep_mean"),
        F.col("_n").alias("n_eff"),
    )


def bootstrap_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_reps: int = 32,
    trim: int = 2,
    salt: str = "boot",
) -> DataFrame:
    """Per-group mean with a bootstrap confidence band: the point
    estimate plus the ``trim``-th smallest / largest replicate mean
    from :func:`poisson_bootstrap_means` (with the default 32
    replicates and trim=2 that's an ~94% empirical interval). Rank
    selection instead of interpolated percentiles keeps the band an
    EXACT order statistic — identical on every engine, no
    percentile-method ambiguity.

    Returns (group_col, n: long, mean: double, ci_lo, ci_hi,
    n_reps: long) ordered by group.
    """
    from pyspark.sql import Window

    means = poisson_bootstrap_means(
        df, group_col, value_col, id_col, n_reps=n_reps, salt=salt
    )
    wa = Window.partitionBy(group_col).orderBy(
        F.col("rep_mean").asc(), F.col("rep").asc()
    )
    wd = Window.partitionBy(group_col).orderBy(
        F.col("rep_mean").desc(), F.col("rep").desc()
    )
    ranked = means.select(
        group_col,
        "rep_mean",
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wd).alias("_rd"),
    )
    ci = ranked.groupBy(group_col).agg(
        F.max(F.when(F.col("_ra") == trim, F.col("rep_mean"))).alias("ci_lo"),
        F.max(F.when(F.col("_rd") == trim, F.col("rep_mean"))).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
    )
    pt = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean"),
    )
    return pt.join(ci, group_col).orderBy(group_col)


def theil_sen_slope(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen robust trend estimator per key: the MEDIAN of all
    pairwise slopes (y_j - y_i) / (x_j - x_i) over x_i < x_j — the
    outlier-proof alternative to OLS slope (grouped_linreg) for noisy
    KPI series: one anomalous day moves the OLS slope arbitrarily but
    shifts the pairwise-slope median by at most one rank.

    Scale contract: the pair join is blocked on the key columns (the
    interval_overlap_pairs shape) — pair volume is sum over keys of
    group², which is bounded when the per-key series is bounded (daily
    series: |days|² per key, never corpus²). The median is Spark's
    exact ``percentile`` (linear interpolation, matching DuckDB's
    ``quantile_cont``), computed per key over its own pair frame.
    """
    base = df.select(
        *key_cols, F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    )
    a = base.select(
        *key_cols, F.col("_x").alias("_xa"), F.col("_y").alias("_ya")
    )
    b = base.select(
        *key_cols, F.col("_x").alias("_xb"), F.col("_y").alias("_yb")
    )
    pairs = a.join(b, key_cols).filter(F.col("_xa") < F.col("_xb"))
    slopes = pairs.select(
        *key_cols,
        (
            (F.col("_yb") - F.col("_ya")).cast("double")
            / (F.col("_xb") - F.col("_xa")).cast("double")
        ).alias("_slope"),
    )
    return (
        slopes.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            # + 0.0 normalizes -0.0 (IEEE: -0.0 + 0.0 = +0.0) so the
            # cross-engine value hash agrees on flat series
            (F.round(F.expr("percentile(_slope, 0.5)"), 6) + F.lit(0.0)).alias(
                "sen_slope"
            ),
        )
        .orderBy(*key_cols)
    )


def bh_fdr(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    key_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR control over a frame of p-values: rank
    the m hypotheses ascending, find the LARGEST k with
    p_(k) <= (k/m)·alpha, and reject hypotheses 1..k — the standard
    multiple-testing correction for metric sweeps (testing 200 segment
    metrics at alpha=.05 uncorrected yields ~10 false alarms; BH bounds
    the expected false-discovery fraction at alpha instead).

    Scale shape: two windows over the hypothesis frame (rank, then a
    running max of the passing rank) — the frame is |hypotheses| rows
    (segments × metrics), never raw-data-sized, so a single-partition
    global window is correct; ``key_cols`` partitions both windows for
    per-family correction when given. ``tiebreak_cols`` break p-value
    ties deterministically (equal p-values are interchangeable for the
    BH cutoff itself, but stable ranks keep replays engine-exact).
    """
    from pyspark.sql import Window

    keys = list(key_cols or [])
    order = [F.col(p_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(
        *order
    )
    m = (
        Window.partitionBy(*keys)
        if keys
        else Window.partitionBy()
    ).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.withColumn("rank", F.row_number().over(w)).withColumn(
        "n_tests", F.count(F.lit(1)).over(m).cast("long")
    )
    ranked = ranked.withColumn(
        "bh_threshold",
        F.round(
            F.col("rank").cast("double")
            / F.col("n_tests").cast("double")
            * F.lit(float(alpha)),
            9,
        ),
    ).withColumn(
        "_pass_rank",
        F.when(F.col(p_col) <= F.col("bh_threshold"), F.col("rank")).otherwise(
            F.lit(0)
        ),
    )
    wcut = (
        Window.partitionBy(*keys) if keys else Window.partitionBy()
    ).orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ranked.withColumn("_cutoff", F.max("_pass_rank").over(wcut))
        .withColumn("rejected", F.col("rank") <= F.col("_cutoff"))
        .drop("_pass_rank", "_cutoff")
        .withColumn("rank", F.col("rank").cast("long"))
    )


def moments_profile(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    decimals: int = 2,
) -> DataFrame:
    """Four-moment distribution profile per key: mean, population
    variance, skewness and excess kurtosis from exact power sums — the
    shape screen that catches what mean/std monitoring misses (a metric
    whose skew flips sign changed distribution even if the mean held).

    Engine-exact by the scaled-long convention (the GD-learner trick):
    values quantize to integers at 10^decimals, the four power sums
    accumulate in DECIMAL(38,0) (exact, order-free — w^4 for a 6-digit
    w still fits 38 digits), and the moment algebra runs ONCE on the
    final sums in fixed-parenthesization double math, so a DuckDB
    replay matches bit-for-bit. One aggregation pass with map-side
    partials; output is |keys| rows. Domain: |value|·10^decimals must
    stay ≤ ~3.16e9 and n·w⁴ ≤ 10³⁸ per group — enforced with a runtime
    assert_true so an out-of-domain input FAILS instead of silently
    nulling (or silently dropping terms from) the high moments while
    the oracle errors.
    """
    keys = list(key_cols or [])
    scale = float(10 ** int(decimals))
    w = F.round(F.col(value_col).cast("double") * F.lit(scale), 0).cast(
        "decimal(19,0)"
    )
    # w² accumulates in DECIMAL(38,0): at decimals=2 a value past ~3.1e7
    # makes w² exceed DECIMAL(19,0), which Spark (non-ANSI) nulls
    # SILENTLY while the DuckDB oracle errors. 38 digits absorbs w²
    # exactly; the remaining bound is w⁴ ≤ 10³⁸, asserted loudly below.
    w2 = (w * w).cast("decimal(38,0)")
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    sums = grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.abs(w)).alias("_wmax"),
        F.sum(w).cast("double").alias("_s1"),
        F.sum(w * w).cast("double").alias("_s2"),
        F.sum(w2 * w).cast("double").alias("_s3"),
        F.sum(w2 * w2).cast("double").alias("_s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s1") / n / F.lit(scale)
    r2 = F.col("_s2") / n / F.lit(scale * scale)
    r3 = F.col("_s3") / n / F.lit(scale * scale * scale)
    r4 = F.col("_s4") / n / F.lit(scale * scale * scale * scale)
    m2 = r2 - mean * mean
    m3 = r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean
    m4 = (
        r4
        - F.lit(4.0) * mean * r3
        + F.lit(6.0) * mean * mean * r2
        - F.lit(3.0) * mean * mean * mean * mean
    )
    # Overflow is LOUD, never a silent null: (a) |w| ≤ 3162277660 ⇔ a
    # single w⁴ fits DECIMAL(38,0) — past it the per-row product nulls
    # and sum() would silently DROP that row's term; (b) the decimal
    # sums themselves must be non-null — n·w⁴ past 10³⁸ nulls the whole
    # sum under non-ANSI while the DuckDB oracle errors. assert_true is
    # NULL on pass, so `+ _ok` is a no-op on every in-domain group.
    _ok = F.coalesce(
        F.assert_true(
            F.col("_wmax").isNull()
            | (
                (F.col("_wmax") <= F.lit(3162277660))
                & F.col("_s2").isNotNull()
                & F.col("_s3").isNotNull()
                & F.col("_s4").isNotNull()
            ),
            F.lit(
                "moments_profile: power sums overflow DECIMAL(38,0) "
                "(|value|*10^decimals must stay <= ~3.16e9 and "
                "n*w^4 <= 1e38) — reduce `decimals` or pre-scale"
            ),
        ).cast("double"),
        F.lit(0.0),
    )
    # The guard rides on EVERY moment column, not just `mean`: if a
    # caller selects only skewness/excess_kurtosis, Catalyst prunes the
    # mean expression — and any guard attached solely to it — so
    # out-of-domain inputs would silently null the high moments again.
    # assert_true is NULL on pass, so `+ _ok` stays a no-op in-domain.
    out = sums.select(
        *keys,
        "n",
        (F.round(mean, 6) + _ok).alias("mean"),
        (F.round(m2, 6) + _ok).alias("variance"),
        F.when(
            m2 > 0,
            F.round(m3 / F.pow(F.sqrt(m2), F.lit(3.0)), 6) + _ok,
        )
        .otherwise(F.lit(0.0) + _ok)
        .alias("skewness"),
        F.when(
            m2 > 0,
            F.round(m4 / (m2 * m2) - F.lit(3.0), 6) + _ok,
        )
        .otherwise(F.lit(0.0) + _ok)
        .alias("excess_kurtosis"),
    )
    return out.orderBy(*keys) if keys else out


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    decimals: int = 2,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups — the
    nonparametric complement to the Welch t (ab_test_summary): no
    normality assumption, robust to the heavy-tailed revenue
    distributions A/B metrics actually have. Returns U for group A, its
    null mean/sd (tie-corrected), and the z statistic.

    Engine-exact: values quantize to ``decimals`` (exact grouping), the
    rank algebra runs on VALUE-level counts — avg rank of a tied value
    is (2·cum_below + cnt + 1)/2, so 2R_A = Σ n_a(v)·(2·cum + cnt + 1)
    is an exact integer sum — and the only irrational step is one final
    sqrt (IEEE correctly rounded). The windows run over the DISTINCT-
    value frame, never raw rows."""
    from pyspark.sql import Window

    v = F.round(F.col(value_col).cast("double"), decimals)
    base = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    per_val = base.groupBy("_v").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("_na_v"),
    )
    w = Window.orderBy(F.col("_v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_val.withColumn(
        "_cum_below", (F.sum("_cnt").over(w) - F.col("_cnt")).cast("long")
    )
    sums = ranked.agg(
        F.sum("_na_v").cast("long").alias("n_a"),
        (F.sum("_cnt") - F.sum("_na_v")).cast("long").alias("n_b"),
        F.sum(
            F.col("_na_v") * (F.lit(2) * F.col("_cum_below") + F.col("_cnt") + 1)
        )
        .cast("long")
        .alias("_r2a"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt") - F.col("_cnt"))
        .cast("long")
        .alias("_tie3"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    u_a = (F.col("_r2a").cast("double") - na * (na + F.lit(1.0))) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma = F.sqrt(
        na * nb / F.lit(12.0)
        * ((nn + F.lit(1.0)) - F.col("_tie3").cast("double") / (nn * (nn - F.lit(1.0))))
    )
    return sums.select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        mu.alias("mu_u"),
        (F.round(sigma, 6) + F.lit(0.0)).alias("sigma_u"),
        F.when(sigma > 0, F.round((u_a - mu) / sigma, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
