"""Aggregation-native supervised classification: models whose training
IS a groupBy — no gradient loops, no collect, no Python in the hot path.

Two classic "counting" learners, each a handful of shuffle aggregations:

* :func:`naive_bayes_predict` — multinomial Naive Bayes over a token
  column. Training = one (token, class) count table + per-class totals;
  scoring = a shuffle join of test tokens against the model. The model
  table can exceed executor memory (web-scale vocab x classes), so the
  join is a plain hash shuffle on the token key and AQE downgrades to
  broadcast when the model is actually small.
* :func:`decision_stump` — the best single threshold split on a numeric
  feature under weighted Gini impurity, evaluated for a caller-supplied
  candidate grid in ONE aggregation pass (a conditional count per
  (candidate, class) cell via explode of a literal array).

Engine-exactness notes (the DuckDB oracles replay the same math):

* Naive Bayes per-row log terms are computed in DOUBLE with every
  intermediate rounded to 9 decimals (absorbing last-ulp ``ln``
  divergence across libm builds), then accumulated in DECIMAL so the
  per-(doc, class) score is order-independent. A residual boundary-case
  divergence moves a score by 1e-9 and can only flip the argmax when
  two classes tie to within that — the emitted CONFUSION MATRIX (not
  raw scores) is therefore stable across engines.
* Gini impurity is pure rational arithmetic on integer counts —
  IEEE-identical in any engine; no logarithms anywhere.

The reference has no learner (it ships point ETL + Prophet forecasting);
these cover the "label a corpus cheaply at 100 TB" step of a training-
data pipeline (e.g. FastText-style language-ID or quality gates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC9 = "decimal(28,9)"
_DEC28 = "decimal(28,0)"


def _scale9(col: Column) -> Column:
    """Half-away-from-zero rounding of a double to 9 decimals, returned
    as the SCALED LONG (x * 1e9): ``floor(x*1e9 + 0.5)`` mirrored for
    negatives. Same engine-exactness contract as ``F.round(x, 9)`` (both
    sides of an oracle replay the identical IEEE multiply/floor) at a
    fraction of the cost — F.round's per-row BigDecimal conversion
    measured ~3x slower across a 600k-row gradient pass. Callers
    accumulate the longs in DECIMAL(28,0) (order-independent, no
    overflow at any corpus size) and divide by 1e9 once at the end."""
    pos = F.floor(col * F.lit(1.0e9) + F.lit(0.5)).cast("long")
    neg = -F.floor((-col) * F.lit(1.0e9) + F.lit(0.5)).cast("long")
    return F.when(col >= 0, pos).otherwise(neg)


def _ln9(col: Column) -> Column:
    """Natural log rounded to 9 decimals (double — exact enough that a
    later x9-rounded product is bit-stable across engines)."""
    return F.round(F.log(col), 9)


def nb_fit(
    train: DataFrame,
    tokens_col: str = "_tk",
    label_col: str = "label",
    alpha: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Train the multinomial NB: returns (model, class_stats) —
    ``model`` = (_t, _c, _ctc) sparse token/class counts (can exceed
    executor memory; joined on the token key at scoring time) and
    ``class_stats`` = (_c, _ln_prior, _ln_denom) per-class constants
    (tiny; broadcast by every scorer). Shared by the batch predictor and
    the streaming foreachBatch twin (streaming/microbatch.py
    classify_stream) — train once, score anywhere."""
    tr_tok = train.select(F.col(label_col).alias("_c"), F.explode(tokens_col).alias("_t"))
    model = tr_tok.groupBy("_t", "_c").agg(F.count(F.lit(1)).cast("long").alias("_ctc"))
    cls = tr_tok.groupBy("_c").agg(F.count(F.lit(1)).cast("long").alias("_tc"))
    vocab = model.select("_t").distinct().agg(F.count(F.lit(1)).cast("long").alias("_v"))
    priors = (
        train.groupBy(F.col(label_col).alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("_nd"))
    )
    tot = priors.agg(F.sum("_nd").cast("long").alias("_ndocs"))
    a = float(alpha)
    const = (
        cls.crossJoin(F.broadcast(vocab))
        .join(priors, "_c")
        .crossJoin(F.broadcast(tot))
        .select(
            "_c",
            _ln9(F.col("_nd").cast("double") / F.col("_ndocs").cast("double")).alias(
                "_ln_prior"
            ),
            _ln9(F.col("_tc").cast("double") + F.lit(a) * F.col("_v").cast("double")).alias(
                "_ln_denom"
            ),
        )
    )
    return model, const


def naive_bayes_predict(
    train: DataFrame,
    test: DataFrame,
    tokens_col: str = "_tk",
    label_col: str = "label",
    id_col: str = "doc_id",
    alpha: int = 1,
) -> DataFrame:
    """Fit add-``alpha`` multinomial Naive Bayes on ``train`` (token
    array + label) and return per-test-row ``(id_col, actual, predicted,
    score)`` with the argmax class.

    score(d, c) = ln P(c) + sum_t n_t * ln((c_tc + a) / (T_c + a*V))

    rearranged so the sparse (token, class) model join covers ONLY
    observed pairs — unseen tokens contribute the closed form
    N_d * (ln a - ln(T_c + a*V)), so no dense doc x vocab x class grid
    is ever materialized:

    score = ln P(c) + N_d * (ln a - ln(T_c + a*V))
            + sum_{t seen in c} n_t * (ln(c_tc + a) - ln a)

    Scale: model = one groupBy(token, label) over train tokens; priors
    and class totals are tiny broadcasts; scoring shuffles test tokens
    once on the token key. Ties (and they are ~impossible with real
    text) break on the class name ascending.
    """
    model, const = nb_fit(train, tokens_col=tokens_col, label_col=label_col, alpha=alpha)
    return nb_score(
        test.withColumnRenamed(label_col, "actual"),
        model,
        const,
        tokens_col=tokens_col,
        id_col=id_col,
        alpha=alpha,
        keep_cols=("actual",),
    )


def nb_score(
    test: DataFrame,
    model: DataFrame,
    class_stats: DataFrame,
    tokens_col: str = "_tk",
    id_col: str = "doc_id",
    alpha: int = 1,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score rows against a PRE-TRAINED model (see :func:`nb_fit`):
    returns (id_col, *keep_cols, predicted, score) with the per-row
    argmax class. Used by the batch predictor and per micro-batch by the
    streaming twin (streaming/microbatch.py classify_stream) — the model
    tables are ordinary DataFrames, so "deploying" a model is swapping
    the tables they read."""
    a = float(alpha)
    keep = list(keep_cols)
    te_tok = (
        test.select(F.col(id_col), *keep, F.explode(tokens_col).alias("_t"))
        .groupBy(id_col, *keep, "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_nt"))
    )
    doc_len = te_tok.groupBy(id_col, *keep).agg(
        F.sum("_nt").cast("long").alias("_ndoc")
    )

    # Seen-token correction per (doc, class): sparse join on the token
    # key. Every per-row product is double math on 9-decimal operands,
    # re-rounded to 9 and summed as DECIMAL (order-independent).
    ln_a = _ln9(F.lit(a))
    seen = (
        te_tok.join(model, "_t")
        .groupBy(id_col, "_c")
        .agg(
            F.sum(
                F.round(
                    F.col("_nt").cast("double")
                    * (_ln9(F.col("_ctc").cast("double") + F.lit(a)) - ln_a),
                    9,
                ).cast(_DEC9)
            ).alias("_seen_mass")
        )
    )

    grid = doc_len.crossJoin(F.broadcast(class_stats))
    scored = grid.join(seen, [id_col, "_c"], "left").select(
        id_col,
        *keep,
        F.col("_c").alias("predicted"),
        (
            F.round(F.col("_ln_prior"), 9).cast(_DEC9)
            + F.round(
                F.col("_ndoc").cast("double") * (ln_a - F.col("_ln_denom")), 9
            ).cast(_DEC9)
            + F.coalesce(F.col("_seen_mass"), F.lit(0).cast(_DEC9))
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("predicted").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def decision_stump(
    df: DataFrame,
    feature: str,
    label: str,
    thresholds: list[float],
) -> DataFrame:
    """Evaluate every candidate threshold ``feature <= t`` as a 1-split
    decision stump under weighted Gini impurity; return all candidates
    ranked (rank 1 = best split).

    One pass: each row explodes onto the candidate grid (a LITERAL array
    — candidates x classes cells, bounded), then two nested aggs compute
    left/right class counts and the weighted Gini. Pure integer counts
    and IEEE-exact double quotients — no ln, engine-exact to the oracle.

    At 100 TB the explode multiplies the scan by |thresholds| — callers
    pass a bounded grid (e.g. 20 candidates from a prior stats pass), so
    the blowup is a constant factor over ONE scan, still beating
    |thresholds| separate filtered aggregations.
    """
    t_arr = F.array(*[F.lit(float(t)) for t in thresholds])
    cells = (
        df.select(F.col(feature).alias("_x"), F.col(label).alias("_y"))
        .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .select("_x", "_y", F.explode(t_arr).alias("threshold"))
        .groupBy("threshold", "_y")
        .agg(
            F.sum(F.when(F.col("_x") <= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("_nl"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
    )
    per_t = cells.groupBy("threshold").agg(
        F.sum("_nl").cast("long").alias("_l"),
        F.sum("_n").cast("long").alias("_tot"),
        F.sum(F.col("_nl") * F.col("_nl")).cast("long").alias("_sql2"),
        F.sum((F.col("_n") - F.col("_nl")) * (F.col("_n") - F.col("_nl")))
        .cast("long")
        .alias("_sqr2"),
    )
    left = F.col("_l").cast("double")
    right = (F.col("_tot") - F.col("_l")).cast("double")
    n = F.col("_tot").cast("double")
    gini_l = F.when(
        F.col("_l") > 0,
        F.lit(1.0) - F.col("_sql2").cast("double") / (left * left),
    ).otherwise(F.lit(0.0))
    gini_r = F.when(
        F.col("_tot") - F.col("_l") > 0,
        F.lit(1.0) - F.col("_sqr2").cast("double") / (right * right),
    ).otherwise(F.lit(0.0))
    scored = per_t.select(
        "threshold",
        F.col("_l").alias("n_left"),
        (F.col("_tot") - F.col("_l")).cast("long").alias("n_right"),
        F.round((left / n) * gini_l + (right / n) * gini_r, 9).alias("weighted_gini"),
    )
    w = Window.orderBy(F.col("weighted_gini").asc(), F.col("threshold").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "threshold", "n_left", "n_right", "weighted_gini"
    )


def logistic_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """Logistic regression by FIXED-iteration full-batch gradient
    descent — the third learner, completing the counting pair above
    with the simplest gradient model. Deliberately breaks this module's
    "no loops" rule the way clustering.kmeans does: the driver loop
    carries only the (k+1)-scalar weight vector (one 1-row collect per
    iteration — never data-sized), while every gradient is one
    aggregation pass over the distributed frame.

    Engine-exactness (the recipe that makes a GD loop hash-matchable,
    same playbook as the Naive Bayes log terms): per-row gradient
    terms ``(sigmoid(w.x) - y) * x_j`` are rounded to 9 decimals —
    absorbing last-ulp ``exp`` divergence across libm builds — then
    accumulated in DECIMAL (order-independent), so the weight vector
    after every iteration is IDENTICAL in any engine replaying the
    same unrolled steps. Inputs must already be cross-engine-exact
    (standardize from decimal moments).

    Returns one row: n, w0 (bias), w1..wk, train accuracy and mean
    log-loss (both from 9-rounded scores).
    """
    feats = [F.col(c).cast("double").alias(f"_x{j + 1}") for j, c in enumerate(feature_cols)]
    # persisted: the loop scans this frame iterations + 1 times (one
    # gradient pass each + the final metrics pass)
    data = df.select(F.col(label_col).cast("double").alias("_y"), *feats).persist()
    k = len(feature_cols)
    w = [0.0] * (k + 1)

    def _sig():
        z = F.lit(w[0])
        for j in range(k):
            z = z + F.lit(w[j + 1]) * F.col(f"_x{j + 1}")
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    for _ in range(int(iterations)):
        sig = _sig()
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs.append(F.sum(_scale9(sig - F.col("_y")).cast(_DEC28)).alias("_g0"))
        for j in range(k):
            aggs.append(
                F.sum(
                    _scale9((sig - F.col("_y")) * F.col(f"_x{j + 1}")).cast(_DEC28)
                ).alias(f"_g{j + 1}")
            )
        row = data.agg(*aggs).collect()[0]
        n = row["_n"]
        for j in range(k + 1):
            w[j] = w[j] - lr * ((float(row[f"_g{j}"]) / 1.0e9) / n)
    # scaled-long sigmoid: exact integer compares for accuracy; the
    # 9-dec double feeds the log terms identically in any engine
    sig_l = _scale9(_sig())
    sig = sig_l.cast("double") / F.lit(1.0e9)
    loss = _scale9(
        -(
            F.col("_y") * F.log(sig)
            + (F.lit(1.0) - F.col("_y")) * F.log(F.lit(1.0) - sig)
        )
    ).cast(_DEC28)
    hit = (
        ((sig_l > 500000000) & (F.col("_y") == 1.0))
        | ((sig_l <= 500000000) & (F.col("_y") == 0.0))
    ).cast("long")
    out_cols = [F.count(F.lit(1)).cast("long").alias("n")]
    for j in range(k + 1):
        out_cols.append(F.round(F.lit(w[j]), 6).alias(f"w{j}"))
    out_cols.append(
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
            "accuracy"
        )
    )
    out_cols.append(
        F.round(
            (F.sum(loss).cast("double") / F.lit(1.0e9))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("log_loss")
    )
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(data.agg(*out_cols), data)


def quantile_regression_gd(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    tau: float = 0.9,
    iterations: int = 5,
    lr: float = 1.0,
) -> DataFrame:
    """Linear quantile regression (pinball loss) by fixed-iteration
    full-batch subgradient descent — logistic_gd's sibling for the
    "P90 of y given x" question (delivery-time SLAs, spend ceilings).
    The pinball subgradient per row is ``(1{y < pred} - tau) * x_j`` —
    pure comparisons and multiplies, no transcendental functions — so
    with the module's rounded-term + DECIMAL-sum recipe the weight
    trajectory is engine-exact, and the per-row indicator itself is
    exact (pred is the same double in any engine).

    Same driver-loop contract as logistic_gd: the loop carries k+1
    scalars, each gradient is one aggregation pass, the frame is
    persisted for the iterations + 1 scans. Returns one row: n, w0..wk,
    pinball_loss (mean), coverage (fraction with y <= pred; approaches
    tau as the fit converges).
    """
    feats = [
        F.col(c).cast("double").alias(f"_x{j + 1}")
        for j, c in enumerate(feature_cols)
    ]
    data = df.select(F.col(target_col).cast("double").alias("_y"), *feats).persist()
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    t = float(tau)

    def _pred():
        z = F.lit(w[0])
        for j in range(k):
            z = z + F.lit(w[j + 1]) * F.col(f"_x{j + 1}")
        return z

    for _ in range(int(iterations)):
        ind = (F.col("_y") < _pred()).cast("double") - F.lit(t)
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs.append(F.sum(_scale9(ind).cast(_DEC28)).alias("_g0"))
        for j in range(k):
            aggs.append(
                F.sum(_scale9(ind * F.col(f"_x{j + 1}")).cast(_DEC28)).alias(
                    f"_g{j + 1}"
                )
            )
        row = data.agg(*aggs).collect()[0]
        n = row["_n"]
        for j in range(k + 1):
            w[j] = w[j] - lr * ((float(row[f"_g{j}"]) / 1.0e9) / n)
    pred = _pred()
    u = F.col("_y") - pred
    pinball = _scale9(
        F.when(u >= 0, F.lit(t) * u).otherwise((F.lit(t) - F.lit(1.0)) * u)
    ).cast(_DEC28)
    out_cols = [F.count(F.lit(1)).cast("long").alias("n")]
    for j in range(k + 1):
        out_cols.append(F.round(F.lit(w[j]), 6).alias(f"w{j}"))
    out_cols.append(
        F.round(
            (F.sum(pinball).cast("double") / F.lit(1.0e9))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pinball_loss")
    )
    out_cols.append(
        F.round(
            F.sum((F.col("_y") <= pred).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("coverage")
    )
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(data.agg(*out_cols), data)


def huber_regression_gd(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    delta: float = 1.0,
    iterations: int = 5,
    lr: float = 0.5,
) -> DataFrame:
    """Linear Huber regression by fixed-iteration full-batch gradient
    descent — the third engine-exact learner beside logistic_gd and
    quantile_regression_gd: quadratic loss near zero (efficient on
    clean rows), linear beyond ``delta`` (bounded influence, so a few
    corrupted rows cannot drag the fit the way OLS lets them). The
    gradient per row is ``-clip(y - pred, ±delta) · x_j`` — pure
    comparisons and multiplies, no transcendentals — so the module's
    rounded-term + DECIMAL-sum recipe makes the whole weight trajectory
    engine-exact and the DuckDB oracle replays the identical unrolled
    steps.

    Same driver-loop contract as the siblings: the loop carries k+1
    scalars, each gradient is one aggregation pass over the persisted
    frame. Returns one row: n, w0..wk, huber_loss (mean), mae.
    """
    feats = [
        F.col(c).cast("double").alias(f"_x{j + 1}")
        for j, c in enumerate(feature_cols)
    ]
    data = df.select(F.col(target_col).cast("double").alias("_y"), *feats).persist()
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    d = float(delta)

    def _pred():
        z = F.lit(w[0])
        for j in range(k):
            z = z + F.lit(w[j + 1]) * F.col(f"_x{j + 1}")
        return z

    for _ in range(int(iterations)):
        r = F.col("_y") - _pred()
        clip = (
            F.when(r > F.lit(d), F.lit(d))
            .when(r < F.lit(-d), F.lit(-d))
            .otherwise(r)
        )
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs.append(F.sum(_scale9(clip).cast(_DEC28)).alias("_g0"))
        for j in range(k):
            aggs.append(
                F.sum(_scale9(clip * F.col(f"_x{j + 1}")).cast(_DEC28)).alias(
                    f"_g{j + 1}"
                )
            )
        row = data.agg(*aggs).collect()[0]
        n = row["_n"]
        for j in range(k + 1):
            w[j] = w[j] + lr * ((float(row[f"_g{j}"]) / 1.0e9) / n)
    pred = _pred()
    r = F.col("_y") - pred
    a = F.abs(r)
    hub = _scale9(
        F.when(a <= F.lit(d), F.lit(0.5) * r * r)
        .otherwise(F.lit(d) * (a - F.lit(0.5) * F.lit(d)))
    ).cast(_DEC28)
    mae = _scale9(a).cast(_DEC28)
    out_cols = [F.count(F.lit(1)).cast("long").alias("n")]
    for j in range(k + 1):
        out_cols.append(F.round(F.lit(w[j]), 6).alias(f"w{j}"))
    out_cols.append(
        F.round(
            (F.sum(hub).cast("double") / F.lit(1.0e9))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("huber_loss")
    )
    out_cols.append(
        F.round(
            (F.sum(mae).cast("double") / F.lit(1.0e9))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mae")
    )
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(data.agg(*out_cols), data)
