"""Deterministic dataset splitting and sampling for training pipelines.

Every assignment is a pure function of (salt, id) via the engine's
portable md5-prefix hash (same convention as datapipe/dedup.py:48) — so
splits are reproducible across runs, engines, and cluster sizes, never
dependent on partition layout or RNG state (Spark's ``rand()`` is
neither cross-engine portable nor stable under repartitioning).

Scale notes:

* :func:`assign_split` is a projection — zero shuffle, scan-speed at
  any size, and downstream ``WHERE split = 'train'`` predicate-pushes.
* :func:`sample_per_group` is one shuffle on the group key + a per-group
  sort. With few, huge groups the window sort is the bottleneck; for
  tiny ``n_per_group`` on billion-row groups, pre-filter with
  ``hash_bucket(id, salt, B) == 0`` (B sized so ~10-100x n survives)
  before the window — the hash-ordered rank of survivors equals the
  global hash-ordered rank, so the result is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, salt: str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets): int(md5(salt:id)[:7], 16)
    mod n_buckets. 28-bit hash — portable to any engine with md5."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 7), 16, 10
    ).cast("long")
    return (h % F.lit(int(n_buckets))).alias("bucket")


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add ``bucket`` and ``split`` columns. ``weights`` maps split name
    to an integer share (default train/val/test = 8/1/1); a row lands in
    the split whose cumulative range covers its bucket. Pure projection:
    no shuffle, stable under any repartitioning."""
    if weights is None:
        weights = {"train": 8, "val": 1, "test": 1}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive integer")
    bucket = hash_bucket(id_col, salt, total)
    expr = F.lit(None).cast("string")
    hi = total
    for name, share in reversed(list(weights.items())):
        lo = hi - share
        expr = F.when((F.col("bucket") >= lo) & (F.col("bucket") < hi), name).otherwise(
            expr
        )
        hi = lo
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_group`` rows with the
    smallest hash(salt:id) per group (ties broken by id). Adds ``rank``
    (1-based within group). Equivalent to a uniform random sample per
    stratum, but reproducible and engine-portable."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n_per_group)
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    every row gets a ``shard`` and a ``pos`` (1-based) within it, both
    pure functions of (salt, id).

    This is how you shuffle 100TB: NOT a random sort (non-reproducible,
    one global sort) but a hash-shard + within-shard hash sort — one
    shuffle on the shard key, each shard sorts independently, and the
    (shard, pos) order is a uniform permutation that any engine, any
    cluster size, any restart reproduces exactly. Downstream writers
    emit one file per shard; readers stream shards in order.

    Size ``n_shards`` to the cluster, not the default: the within-shard
    sort runs one reducer per shard, so at 100TB use thousands of
    shards (~ total cores, and small enough that a shard fits an
    executor's spill budget). The permutation stays deterministic for
    any shard count.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    out = df.withColumn("h", h).withColumn(
        "shard", (F.col("h") % F.lit(int(n_shards))).cast("long")
    )
    w = Window.partitionBy("shard").orderBy(F.col("h"), F.col(id_col))
    return (
        out.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("h")
    )


def weighted_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Domain-mixture downsampling: keep each row with its group's rate,
    decided by a deterministic per-row hash — the Bernoulli thinning
    stage of a data-mixing pipeline (e.g. web 30% / books 100%).

    Pure projection + filter: zero shuffle, scan-speed at any size,
    reproducible across engines (hash < rate·resolution on a 28-bit
    md5-prefix bucket — integer compare, no float RNG). Groups absent
    from ``rates`` keep ``default_rate``. Rates are derived offline from
    target mixture weights and per-group counts (model parameters, like
    centroids) — deriving them inline would be one count-agg job.
    """
    bucket = hash_bucket(id_col, salt, resolution)
    thresholds = F.create_map(
        *[
            x
            for name, rate in sorted(rates.items())
            for x in (F.lit(name), F.lit(int(round(rate * resolution))))
        ]
    )
    thr = F.coalesce(
        thresholds[F.col(group_col)],
        F.lit(int(round(default_rate * resolution))),
    )
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < thr).drop("bucket")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.7,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture sampling: keep rows so the output
    group shares follow ``n_g^alpha`` (normalized) — the standard
    multilingual/multi-domain LLM recipe that up-samples small groups
    (alpha < 1 flattens the distribution; alpha = 1 keeps natural
    proportions). ``target_frac`` sets the output size as a fraction of
    the input; a group whose implied rate exceeds 1 is fully kept (no
    up-replication here — pair with an explicit repeat stage if true
    oversampling is needed).

    Scale shape: one tiny per-group count agg broadcast back, then the
    same zero-shuffle hash-threshold projection as
    :func:`weighted_sample`. Determinism across engines: the alpha
    powers are rounded to 6 decimals and summed as DECIMAL (exact,
    order-independent) before normalizing, so the per-group rates — and
    therefore every keep decision — are bit-identical on any engine.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    w6 = F.round(F.pow(F.col("_n").cast("double"), F.lit(alpha)), 6).cast(
        "decimal(28,6)"
    )
    weighted = counts.select(group_col, "_n", w6.alias("_w"))
    totals = weighted.agg(
        F.sum("_w").alias("_sumw"), F.sum("_n").alias("_total")
    )
    rates = (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            F.least(
                F.lit(1.0),
                (
                    F.lit(target_frac)
                    * F.col("_total").cast("double")
                    * (F.col("_w").cast("double") / F.col("_sumw").cast("double"))
                )
                / F.col("_n").cast("double"),
            ).alias("_rate"),
        )
        .select(
            group_col,
            F.round(F.col("_rate") * resolution, 0).cast("long").alias("_thr"),
        )
    )
    bucket = hash_bucket(id_col, salt, resolution)
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("_bucket", bucket)
        .filter(F.col("_bucket") < F.col("_thr"))
        .drop("_bucket", "_thr")
    )


def priority_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``k`` rows, with
    inclusion probability proportional to ``weight_col`` — the A-Res /
    exponential-clocks scheme (Efraimidis & Spirakis): each row draws a
    priority ``ln(u) / w`` with ``u ~ U(0,1]`` and the k largest
    priorities win.

    ``u`` comes from the engine's portable md5-prefix hash of
    (salt, id), not an RNG — the sample is a pure function of the salt,
    reproducible across engines, runs, and cluster layouts. The top-k is
    ``orderBy().limit()`` → TakeOrderedAndProject: per-partition partial
    top-k, one merge, no global sort, no single-partition window — the
    whole operator is a projection plus a top-k at any scale. Priorities
    are rounded to 6dp and tie-broken on id so the selected set is
    total-order deterministic.

    Returns the k sampled rows with their ``priority``.
    """
    h = hash_bucket(id_col, salt, 1 << 28)
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 28))
    prio = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    return (
        df.withColumn("priority", prio)
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k)
    )


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    salt: str = "fold",
) -> DataFrame:
    """Leakage-aware k-fold assignment: the fold is a pure md5 function
    of the GROUP (author/source/domain/session), so every row of a
    group lands in the same fold — near-duplicate or correlated rows
    can never straddle a train/validation boundary (the group-k-fold
    discipline; row-level folding over correlated data leaks and
    inflates eval scores).

    Pure projection: zero shuffle, stable under repartitioning and
    across runs/engines (same md5-bucket kernel as assign_split).
    Adds ``fold`` (0..k-1).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    return df.withColumn("fold", hash_bucket(group_col, salt, k))


def negative_sample_candidates(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    max_item: int,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training
    pairs: for every distinct user in ``positives``, propose ``k``
    hash-derived candidate items in [1, max_item] and keep those the
    user has NOT interacted with — the standard contrastive-pair
    generator for recommender / embedding training, at anti-join cost
    instead of materializing the user x item complement (which is
    astronomically large at scale).

    Scale shape: candidates are a pure map-side projection (users x k
    rows, no RNG state — the md5-prefix hash makes every draw a pure
    function of (salt, user, j), reproducible across engines and
    retries); the only shuffle is the left-anti join against the
    positive pairs on (user, item). Collisions with positives simply
    drop (expected loss k * |items_u| / max_item — negligible when the
    catalog is large); j is retained so downstream can distinguish
    draws.

    Returns (user_col, j: int, item_col) — the accepted negatives.
    """
    users = positives.select(user_col).distinct()
    cand = users.select(
        user_col,
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
    ).select(
        user_col,
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"),
                            F.col(user_col).cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(max_item)
            + F.lit(1)
        ).alias(item_col),
    )
    return cand.join(
        positives.select(user_col, item_col).distinct(),
        [user_col, item_col],
        "left_anti",
    ).select(user_col, F.col("j").cast("int").alias("j"), item_col)


def label_weights(
    df: DataFrame,
    label_col: str,
    beta: float = 0.999,
) -> DataFrame:
    """Per-class training weights for an imbalanced label column, two
    standard schemes in one pass:

    * ``inv_weight`` — inverse frequency, N / (K * n_c): the classic
      rebalancing that makes every class contribute equally;
    * ``cb_weight`` — class-balanced "effective number of samples"
      (Cui et al. 2019), (1 - beta) / (1 - beta^n_c), normalized to
      mean 1 over classes: softer than inverse frequency when classes
      overlap (each additional sample adds diminishing novelty).

    One groupBy over the label column (map-side combining; K rows out),
    then scalar normalization against broadcast totals. Exact integer
    counts; double math only in the final weight expressions, rounded
    to 6 — engine-reproducible.

    Returns (label_col, n: long, frac, inv_weight, cb_weight) ordered
    by label. Null labels are excluded.
    """
    counts = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = counts.agg(
        F.sum("n").cast("long").alias("_N"), F.count(F.lit(1)).cast("long").alias("_K")
    )
    eff = F.lit(1.0) - F.pow(F.lit(beta), F.col("n").cast("double"))
    # per-class value rounded to 12dp and summed as DECIMAL: the
    # normalizing mean must not depend on float summation order (the
    # module's cross-engine convention — see operators/stats.py)
    raw_cb = F.round((F.lit(1.0) - F.lit(beta)) / eff, 12).cast("decimal(24,12)")
    joined = counts.crossJoin(F.broadcast(tot))
    # keep the exact SUM (not a decimal division — division result
    # types differ across engines); the mean folds into one double
    # expression below: cb = (raw * K) / sum
    # (column names must not collide case-insensitively with tot's
    # _N/_K — Spark's default resolver is case-insensitive)
    cb_mean = joined.agg(
        F.sum(raw_cb).alias("_cbs"),
        F.count(F.lit(1)).cast("long").alias("_cbk"),
    )
    return (
        joined.crossJoin(F.broadcast(cb_mean))
        .select(
            label_col,
            "n",
            F.round(F.col("n").cast("double") / F.col("_N").cast("double"), 6).alias(
                "frac"
            ),
            F.round(
                F.col("_N").cast("double")
                / (F.col("_K").cast("double") * F.col("n").cast("double")),
                6,
            ).alias("inv_weight"),
            F.round(
                raw_cb.cast("double")
                * F.col("_cbk").cast("double")
                / F.col("_cbs").cast("double"),
                6,
            ).alias("cb_weight"),
        )
        .orderBy(label_col)
    )


def stratified_kfold(
    df: DataFrame,
    stratum_col: str,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "skf",
) -> DataFrame:
    """Exactly-balanced stratified k-fold assignment: within each
    stratum, rows are ranked by a deterministic id hash and dealt
    round-robin into folds — every fold holds ±1 of each stratum's
    share (group_kfold keeps correlated GROUPS intact across folds;
    this keeps class/language PROPORTIONS intact, the complement every
    classifier evaluation needs).

    One window per stratum partition (hash order, id tie-break) — the
    shuffle is on the stratum key; assignment is a pure projection
    after the rank. Hash-deterministic: any engine re-deals the same
    folds."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % k).cast("long")
    )


def dsir_log_importance(
    df: DataFrame,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style data selection weights (Xie et al., "Data Selection
    for Language Models via Importance Resampling", public
    arXiv:2302.03169): per-doc log importance
    ``log w(x) = Σ_b n_b(x) · [log p_tgt(b) − log p_src(b)]`` under
    hashed-unigram bag-of-words models with Laplace-``alpha`` smoothing,
    where the target/source models are fit on the two partitions of the
    SAME frame selected by the boolean ``target_col`` — the raw-corpus
    reweighting stage that upsamples documents that look like the
    in-domain slice. Feed the result to
    :func:`priority_sample_topk` (exponential clocks) or a Gumbel
    key for the actual resample.

    Engine-exact by the module conventions: token buckets come from the
    portable md5-prefix hash (pure function of the token), the
    per-bucket log ratio is computed ONCE on a ``buckets``-row frame
    (broadcast — never per token), and per-doc terms are rounded to 9dp
    and summed as DECIMAL so the fold is order-free; a DuckDB replay
    hash-matches.

    Scale shape: one token explode (flatMap, no shuffle), one
    (doc, bucket) count agg, one global bucket agg (``buckets`` rows),
    one broadcast join back, one per-doc agg. Linear end to end.

    Returns (id, n_tokens, log_importance).
    """
    from d2b_dataframework_spark.datapipe.dedup import word_hash
    from d2b_dataframework_spark.datapipe.text import tokens

    b = int(buckets)
    a = float(alpha)
    tok = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("_is_tgt"),
        F.explode(tokens(text_col)).alias("_tok"),
    ).select(
        id_col, "_is_tgt", (word_hash(F.col("_tok")) % F.lit(b)).alias("_b")
    )
    doc_bucket = tok.groupBy(id_col, "_is_tgt", "_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    model = doc_bucket.groupBy("_b").agg(
        F.sum(F.when(F.col("_is_tgt"), F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_tn"),
        F.sum(F.when(~F.col("_is_tgt"), F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_sn"),
    )
    tot = model.agg(
        F.sum("_tn").cast("long").alias("_tt"), F.sum("_sn").cast("long").alias("_st")
    )
    ratio = model.crossJoin(F.broadcast(tot)).select(
        "_b",
        F.round(
            F.log(
                (F.col("_tn").cast("double") + F.lit(a))
                / (F.col("_tt").cast("double") + F.lit(a * b))
            )
            - F.log(
                (F.col("_sn").cast("double") + F.lit(a))
                / (F.col("_st").cast("double") + F.lit(a * b))
            ),
            9,
        ).alias("_r"),
    )
    terms = doc_bucket.join(F.broadcast(ratio), "_b").select(
        F.col(id_col),
        F.col("_n"),
        F.round(F.col("_n").cast("double") * F.col("_r"), 9)
        .cast("decimal(28,9)")
        .alias("_term"),
    )
    return terms.groupBy(id_col).agg(
        F.sum("_n").cast("long").alias("n_tokens"),
        F.round(F.sum("_term").cast("double"), 6).alias("log_importance"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Dedup-aware train/val/test assignment: every member of a near-dup
    CLUSTER lands in the same split, because the hash is taken over the
    cluster id, not the document id.  A plain per-doc split leaks
    paraphrases/twins across the train/eval boundary and silently
    inflates eval scores — the contamination mode
    :func:`assign_split` alone cannot prevent.

    ``pairs`` is any near-dup pair frame (id_a, id_b) — simhash,
    MinHash, embedding; clusters come from the star connected-components
    operator; singletons are their own cluster.  Returns
    (id, cluster_id, bucket, split) — one row per input document.

    Scale shape: connected components is the existing O(log n)-round
    operator; the rest is one left join plus the pure-projection hash
    assignment (no extra shuffle beyond the cluster join).
    """
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.datapipe.dedup import connected_components

    comps = connected_components(pairs)
    # connected_components always labels its id column ``doc_id``;
    # realign it to the caller's id_col so non-default names join.
    # (Capture the tracked persist handles FIRST — withColumnRenamed
    # returns a fresh DataFrame object without the _d2b_persisted tag.)
    comp_handles = tuple(getattr(comps, "_d2b_persisted", ()))
    if id_col != "doc_id":
        comps = comps.withColumnRenamed("doc_id", id_col)
    labeled = (
        docs.select(F.col(id_col))
        .join(comps, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    out = assign_split(labeled, id_col="cluster_id", weights=weights, salt=salt)
    return cache.track(out, *comp_handles)


def token_budget_sample(
    scored: DataFrame,
    budget_tokens: int,
    cell_col: str = "lang",
    id_col: str = "doc_id",
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Budgeted best-first selection: per cell (language, domain, ...),
    take documents in descending quality order until the cell's token
    budget is exhausted — the "best N tokens per domain" curation stage
    that turns unbounded crawl cells into a size-controlled mixture.
    A document is kept while the cell's RUNNING token total (itself
    included) still fits the budget; the first overflowing doc and
    everything below it are dropped.

    ``scored`` must carry (id, cell, quality, token count).  Returns the
    kept rows with 1-based ``rank`` and running ``cum_tokens``.

    Scale shape: one window per CELL (partitioned — never global), rank
    ties broken by id so selection is a total order; cost is one
    shuffle on the cell key. A pathologically hot cell (most of the
    corpus in one language/domain) turns its window into one big
    per-partition sort — still ~n log n, not a shuffle amplification
    (measured under 90%-hot skew in tools/scale_probe.py
    token_budget_skewed) — but at real scale that skew is the cue to
    sub-split the cell key (e.g. (lang, quality-decile)) and stitch
    the per-subcell frontiers, which preserves the selection because
    the walk is quality-ordered.
    """
    w = Window.partitionBy(cell_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_tokens", F.sum(F.col(tokens_col)).over(run).cast("long")
        )
        .filter(F.col("cum_tokens") <= int(budget_tokens))
    )


def cluster_budget_mixture(
    scored: DataFrame,
    pairs: DataFrame,
    budget_tokens: int,
    cell_col: str = "lang",
    id_col: str = "doc_id",
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Cluster-aware token-budget selection — the curation step
    :func:`leakage_safe_split` (cluster ids) and
    :func:`token_budget_sample` (budget frontier) exist to serve,
    composed: the budget is spent on UNIQUE content only, so the
    selection can never pick two near-dup twins the way a plain
    per-doc budget walk silently does (paying the budget twice for
    one document's content).

    Three stages, all key-partitioned:

    1. near-dup pairs -> connected components -> cluster ids
       (singletons are their own cluster);
    2. per-cluster election: the highest-``quality_col`` member (ties
       to the smallest id) represents the cluster — everything else is
       excluded before the budget walk even sees it;
    3. :func:`token_budget_sample` over the representatives, per cell.

    A cluster whose members span cells is represented ONCE, in its
    representative's cell — the dedup-wins-over-mixture convention
    (content appears in the corpus once, whichever cell gets it).

    Returns kept rows with ``cluster_id``, ``rank`` and ``cum_tokens``.
    Scale shape: components is the O(log n)-round star operator; the
    election and budget windows are both partitioned (cluster / cell) —
    nothing global, no all-pairs."""
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.datapipe.dedup import connected_components

    comps = connected_components(pairs)
    comp_handles = tuple(getattr(comps, "_d2b_persisted", ()))
    if id_col != "doc_id":
        comps = comps.withColumnRenamed("doc_id", id_col)
    labeled = scored.join(comps, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    )
    elect = Window.partitionBy("cluster_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    reps = (
        labeled.withColumn("_rn", F.row_number().over(elect))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = token_budget_sample(
        reps,
        budget_tokens,
        cell_col=cell_col,
        id_col=id_col,
        quality_col=quality_col,
        tokens_col=tokens_col,
    )
    return cache.track(out, *comp_handles)
