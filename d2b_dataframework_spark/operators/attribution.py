"""Marketing attribution & cohort operators.

The reference is a marketing ETL framework: its consumers join ad/
organic touchpoints to conversions downstream in BigQuery (the SQL the
reference's README sketches around `d2b_data/Facebook_Marketing.py` /
`d2b_data/Google_GA4.py` outputs). These operators bring that analysis
layer into the engine as first-class distributed ops.

Scale shapes:

* :func:`last_touch_attribution` — one window partitioned by the user
  key (millions of partitions → fully parallel; never a global window)
  carrying the most recent qualifying touch forward, then a tiny
  per-touch-type aggregate.
* :func:`cohort_retention` — two aggregates and a join, all shuffled on
  the same user key, so AQE chains them over one exchange; output is
  |cohort days| × |offsets| rows (tiny at any corpus size).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    tiebreaker: str = "event_id",
) -> DataFrame:
    """Attribute each conversion's value to the most recent preceding
    touch event (same user, at-or-before the conversion); conversions
    with no prior touch land in ``touch_type='none'``.

    Returns one row per touch type: ``touch_type, n_conversions,
    attributed_value`` (decimal-exact sum cast to double).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreaker).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.last(
        F.when(F.col(type_col).isin(*touch_types), F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("_touch", touch)
        .filter(F.col(type_col) == conversion_type)
        .groupBy(F.coalesce(F.col("_touch"), F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention triangle: cohort = the user's first
    active day; for every (cohort_day, day_offset) count the distinct
    users from that cohort active ``day_offset`` days later.

    Returns ``cohort_day (yyyy-MM-dd), day_offset, n_users``; offset 0
    is the cohort size.
    """
    day = F.to_date(ts_col)
    first = events.groupBy(user_col).agg(F.min(day).alias("_cohort"))
    active = events.select(F.col(user_col), day.alias("_day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("_day", "_cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("n_users"))
    )


def time_decay_attribution(
    events: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    halflife_days: float = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    tiebreaker: str = "event_id",
) -> DataFrame:
    """Multi-touch attribution with exponential time decay: every touch
    credits the FIRST conversion at-or-after it (same user), weighted
    ``0.5 ^ (days_before_conversion / halflife)`` and normalized so each
    conversion's credits sum to its value.

    Distributed shape: one backward-looking window per user assigns
    touches to conversions (min of a zero-padded composite key over the
    following rows — strings because engines disagree on struct/list
    aggregation support), one groupBy(conversion) computes the weight
    normalizer, one join spreads the conversion value back. No
    self-joins over the raw stream.

    Weights are rounded to 9dp and normalizer sums run in DECIMAL, so
    results are order-independent and cross-engine exact. Returns
    (touch_type, n_touches, attributed_value).
    """
    key = F.format_string(
        "%020d%020d",
        F.unix_micros(F.col(ts_col).cast("timestamp")),
        F.col(tiebreaker),
    )
    is_conv = F.col(type_col) == conversion_type
    fwd = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreaker).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    staged = events.withColumn("_key", key).withColumn(
        "_conv_key", F.min(F.when(is_conv, key)).over(fwd)
    )
    touches = staged.filter(
        F.col(type_col).isin(*touch_types) & F.col("_conv_key").isNotNull()
    ).select(
        user_col,
        F.col(type_col).alias("_touch"),
        "_conv_key",
        F.round(
            F.pow(
                F.lit(0.5),
                (
                    F.substring("_conv_key", 1, 20).cast("double")
                    - F.substring("_key", 1, 20).cast("double")
                )
                / F.lit(86400.0 * 1e6)
                / F.lit(float(halflife_days)),
            ),
            9,
        ).alias("_w"),
    )
    norms = touches.groupBy(user_col, "_conv_key").agg(
        F.sum(F.col("_w").cast("decimal(28,9)")).cast("double").alias("_wsum")
    )
    convs = staged.filter(is_conv).select(
        user_col,
        F.col("_key").alias("_conv_key"),
        F.col(value_col).cast("double").alias("_val"),
    )
    credited = (
        touches.join(norms, [user_col, "_conv_key"])
        .join(convs, [user_col, "_conv_key"])
        .select(
            F.col("_touch").alias("touch_type"),
            F.round((F.col("_val") * F.col("_w")) / F.col("_wsum"), 6).alias("_credit"),
        )
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(F.col("_credit").cast("decimal(28,6)")).cast("double").alias(
            "attributed_value"
        ),
    )


def position_attribution(
    events: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    tiebreaker: str = "event_id",
    first_w: float = 0.4,
    last_w: float = 0.4,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: per
    conversion, the FIRST touch gets ``first_w`` of the value, the LAST
    gets ``last_w``, the middle touches split the remainder evenly; a
    single touch gets 1.0, exactly two get first_w/(first_w+last_w)
    each side — the marketing-standard 40/20/40 recipe completing the
    engine's last-touch / time-decay family.

    Distributed shape: the SAME one-window conversion assignment as
    time_decay_attribution (min forward composite key per user), then a
    per-conversion count + two rank windows (partitioned by conversion
    key — parallel), weights as exact rational doubles, value x weight
    rounded to 9 and summed in DECIMAL. Returns (touch_type, n_touches,
    attributed_value)."""
    key = F.format_string(
        "%020d%020d",
        F.unix_micros(F.col(ts_col).cast("timestamp")),
        F.col(tiebreaker),
    )
    is_conv = F.col(type_col) == conversion_type
    fwd = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreaker).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    staged = events.withColumn("_key", key).withColumn(
        "_conv_key", F.min(F.when(is_conv, key)).over(fwd)
    )
    touches = staged.filter(
        F.col(type_col).isin(*touch_types) & F.col("_conv_key").isNotNull()
    ).select(
        user_col,
        F.col(type_col).alias("_touch"),
        "_key",
        "_conv_key",
    )
    wa = Window.partitionBy(user_col, "_conv_key").orderBy(F.col("_key").asc())
    wd = Window.partitionBy(user_col, "_conv_key").orderBy(F.col("_key").desc())
    ranked = touches.select(
        user_col,
        "_touch",
        "_conv_key",
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wd).alias("_rd"),
        F.count(F.lit(1)).over(
            Window.partitionBy(user_col, "_conv_key")
        ).alias("_n"),
    )
    mid_w = 1.0 - first_w - last_w
    weight = (
        F.when(F.col("_n") == 1, F.lit(1.0))
        .when(
            F.col("_n") == 2,
            F.when(
                F.col("_ra") == 1, F.lit(first_w / (first_w + last_w))
            ).otherwise(F.lit(last_w / (first_w + last_w))),
        )
        .when(F.col("_ra") == 1, F.lit(first_w))
        .when(F.col("_rd") == 1, F.lit(last_w))
        .otherwise(F.lit(mid_w) / (F.col("_n") - 2).cast("double"))
    )
    convs = events.filter(is_conv).select(
        user_col,
        key.alias("_conv_key"),
        F.col(value_col).cast("decimal(18,2)").alias("_cv"),
    )
    credited = ranked.join(convs, [user_col, "_conv_key"]).select(
        "_touch",
        F.round(weight * F.col("_cv").cast("double"), 9).cast("decimal(28,9)").alias(
            "_credit"
        ),
    )
    return credited.groupBy(F.col("_touch").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(F.sum("_credit").cast("double"), 6).alias("attributed_value"),
    )


def markov_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov journey transitions for removal-effect
    attribution: per user, the touch sequence (every non-conversion
    event strictly BEFORE the first conversion; all events when the
    user never converts) becomes ``start -> t1 -> ... -> tn -> conv|
    null``; converted users with no prior touch contribute ``start ->
    conv``. Returns (from_state, to_state, n, p) with p = n / outgoing
    total — the matrix every Markov attribution solve starts from.

    Scale shape: one per-user min-ts aggregate, one per-user window
    (lead over the user's own touches — millions of partitions, fully
    parallel), one (state, state) count agg whose output is bounded by
    (|channels| + 2)^2 regardless of corpus size."""
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
    )
    conv = (
        ev.filter(F.col("_t") == conversion_type)
        .groupBy("_u")
        .agg(F.min("_ts").alias("_cts"))
    )
    touches = (
        ev.filter(F.col("_t") != conversion_type)
        .join(conv, "_u", "left")
        .filter(F.col("_cts").isNull() | (F.col("_ts") < F.col("_cts")))
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_tb")
    ordered = touches.select(
        "_u",
        "_t",
        "_cts",
        F.row_number().over(w).alias("_rn"),
        F.lead("_t").over(w).alias("_nxt"),
    )
    first = ordered.filter(F.col("_rn") == 1).select(
        F.lit("start").alias("from_state"), F.col("_t").alias("to_state")
    )
    steps = ordered.select(
        F.col("_t").alias("from_state"),
        F.coalesce(
            "_nxt",
            F.when(F.col("_cts").isNotNull(), F.lit("conv")).otherwise(
                F.lit("null")
            ),
        ).alias("to_state"),
    )
    bare = (
        conv.join(touches.select("_u").distinct(), "_u", "left_anti")
        .select(F.lit("start").alias("from_state"), F.lit("conv").alias("to_state"))
    )
    counts = (
        first.unionByName(steps)
        .unionByName(bare)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot).cast("double")).alias("p"),
    )


def markov_removal_attribution(
    transitions: DataFrame,
    channels: list[str],
    iterations: int = 15,
) -> DataFrame:
    """Markov removal-effect attribution (the channel-interaction-aware
    answer to last-touch): conversion probability from 'start' is solved
    by FIXED-iteration value iteration ``v(s) = P(s->conv) + sum P(s->
    s') v(s')`` on the full graph and once per channel with that channel
    removed (its transitions deleted, the lost mass falling to
    non-conversion — the standard removal semantics); a channel's credit
    is its relative conversion drop, normalized into attribution shares.

    The transition matrix is (|channels| + 2)^2-bounded, so the solve
    COLLECTS it (a tiny fixed-size collect, the kmeans-centroid
    contract) and runs the ~dozen-state iteration driver-side; every
    iterate rounds to 9 decimals so an engine replaying the same
    unrolled steps (the oracle's generated CTE chain) lands on identical
    doubles despite arbitrary float-sum order. Fixed ``iterations``
    keeps it deterministic and oracle-replayable; convergence is
    geometric (spectral radius < 1 for any absorbing chain), so 15
    iterations pin far more than the 6 rounded decimals reported.

    Returns one row per channel: p_conv_full, p_conv_removed,
    removal_effect, attribution_share (rounded at 6).
    """
    rows = transitions.collect()  # bounded by (|channels|+2)^2
    p: dict[str, dict[str, float]] = {}
    for r in rows:
        p.setdefault(r["from_state"], {})[r["to_state"]] = float(r["p"])

    def conv_prob(removed: str | None) -> float:
        states = [s for s in sorted(p) if s != removed]
        v = {s: 0.0 for s in states}
        for _ in range(int(iterations)):
            nv = {}
            for s in states:
                acc = 0.0
                for to, pp in sorted(p[s].items()):
                    if to == "conv":
                        acc += pp
                    elif to == "null" or to == removed:
                        continue
                    else:
                        acc += pp * v.get(to, 0.0)
                nv[s] = round(acc, 9)
            v = nv
        return v.get("start", 0.0)

    full = conv_prob(None)
    removed_p = {c: conv_prob(c) for c in channels}
    effects = {
        c: ((full - removed_p[c]) / full) if full > 0.0 else 0.0 for c in channels
    }
    tot = sum(effects[c] for c in sorted(effects))
    out = [
        (
            c,
            round(full, 6),
            round(removed_p[c], 6),
            round(effects[c], 6),
            round(effects[c] / tot, 6) if tot != 0.0 else None,
        )
        for c in sorted(channels)
    ]
    return transitions.sparkSession.createDataFrame(
        out,
        "channel string, p_conv_full double, p_conv_removed double, "
        "removal_effect double, attribution_share double",
    )


def shapley_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    channels: list[str],
) -> DataFrame:
    """Shapley-value attribution over journey channel SETS — the
    coalition-game answer (order-free) beside the Markov removal
    effect: the coalition value v(S) counts conversions from journeys
    that used only channels in S, and a channel's credit is its exact
    Shapley value over that game.

    Everything stays distributed AND exact-integer: journeys reduce to
    a bitmask per user (bit_or agg), coalition values come from a
    16-row subset join ((journey_mask & S) = journey_mask), and the
    Shapley sum is computed scaled by n! — weights k!(n-1-k)! are
    integer literals, so phi*n! is a LONG (no float-sum order anywhere;
    the only doubles are the final two rounded ratios). Scale shape:
    one per-user agg + joins over 2^n-row frames (n = |channels|, a
    constant); the fact table is scanned once.

    Returns one row per channel: phi_scaled (phi * n!, exact),
    shapley_conversions (= phi), attribution_share.
    """
    import math

    n = len(channels)
    bits = {c: 1 << i for i, c in enumerate(sorted(channels))}
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_t"),
    )
    conv = (
        ev.filter(F.col("_t") == conversion_type)
        .groupBy("_u")
        .agg(F.min("_ts").alias("_cts"))
    )
    touches = (
        ev.filter(F.col("_t") != conversion_type)
        .join(conv, "_u", "left")
        .filter(F.col("_cts").isNull() | (F.col("_ts") < F.col("_cts")))
    )
    bit_col = F.lit(0)
    for c, b in bits.items():
        bit_col = F.when(F.col("_t") == c, F.lit(b)).otherwise(bit_col)
    with_touches = (
        touches.select("_u", bit_col.alias("_bit"), "_cts")
        .groupBy("_u")
        .agg(
            F.expr("bit_or(_bit)").alias("mask"),
            F.max(F.col("_cts").isNotNull().cast("long")).alias("converted"),
        )
    )
    bare = conv.join(touches.select("_u").distinct(), "_u", "left_anti").select(
        "_u", F.lit(0).alias("mask"), F.lit(1).alias("converted")
    )
    journeys = (
        with_touches.select("_u", "mask", "converted")
        .unionByName(bare)
        .groupBy("mask")
        .agg(F.sum("converted").cast("long").alias("n_conv"))
    )
    masks = spark.range(1 << n).select(F.col("id").cast("int").alias("s"))
    # persisted: vtab (2^n rows) feeds BOTH sides of the marginal join —
    # unpersisted, the whole journey pipeline would be scanned twice
    vtab = (
        masks.join(
            journeys,
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("long").alias("v"))
        .persist()
    )
    coef = {k: math.factorial(k) * math.factorial(n - 1 - k) for k in range(n)}
    coef_col = F.lit(None).cast("long")
    for k, w in coef.items():
        coef_col = F.when(F.bit_count(F.col("s")) == k, F.lit(w)).otherwise(coef_col)
    chan = spark.createDataFrame(
        sorted(bits.items()), "channel string, bit int"
    )
    pairs = chan.join(
        vtab.withColumnRenamed("s", "s").withColumnRenamed("v", "v_s"),
        F.col("s").bitwiseAND(F.col("bit")) == 0,
    )
    joined = pairs.join(
        vtab.select(F.col("s").alias("s2"), F.col("v").alias("v_sc")),
        F.col("s2") == F.col("s") + F.col("bit"),
    )
    phi = joined.groupBy("channel").agg(
        F.sum(coef_col * (F.col("v_sc") - F.col("v_s"))).cast("long").alias(
            "phi_scaled"
        )
    )
    nfact = float(math.factorial(n))
    tot = phi.agg(F.sum("phi_scaled").cast("long").alias("_tot"))
    out = (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "phi_scaled",
            F.round(F.col("phi_scaled").cast("double") / F.lit(nfact), 6).alias(
                "shapley_conversions"
            ),
            F.when(
                F.col("_tot") != 0,
                F.round(
                    F.col("phi_scaled").cast("double") / F.col("_tot").cast("double"),
                    6,
                ),
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(out, vtab)
