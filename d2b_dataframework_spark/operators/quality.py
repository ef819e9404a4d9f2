"""Declarative data-quality expectations (Deequ-style, engine-native).

A 100TB nightly load needs its invariants checked IN the engine, in as
few passes as the checks allow:

* :func:`expect_columns` — every row-level predicate folds into ONE
  aggregation pass over the table (a conditional-sum per rule inside a
  single agg — no per-rule scans);
* :func:`expect_unique` — one distinct-count pass per key set;
* :func:`expect_ref_integrity` — one anti-join per FK relation (the
  child side streams; broadcast the parent key set when it fits);
* :func:`quality_report` — unions the per-rule rows into one tidy
  (check, n_violations, n_rows, passed) frame.

The reference validates per-batch payloads row-by-row in Python
(d2b_data/shopify_api.py:135-142 defaulting, Alodesk_API.py malformed-
row skips); this is the distributed, declarative equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_columns(df: DataFrame, preds: dict[str, Column]) -> DataFrame:
    """One-pass row-level checks: ``preds`` maps check name → a boolean
    Column that should hold for every row (nulls count as violations).
    Returns (check, n_violations, n_rows)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("_total")] + [
        F.sum(F.when(p, 0).otherwise(1)).cast("long").alias(f"_v_{i}")
        for i, p in enumerate(preds.values())
    ]
    row = df.agg(*aggs)
    stack_args = []
    for i, name in enumerate(preds):
        stack_args += [F.lit(name), F.col(f"_v_{i}")]
    return row.select(
        F.stack(F.lit(len(preds)), *stack_args).alias("check", "n_violations"),
        F.col("_total").alias("n_rows"),
    )


def expect_unique(df: DataFrame, keys: list[str], name: str | None = None) -> DataFrame:
    """Key-uniqueness check: violations = rows beyond the first per key
    (count - distinct count). Null-containing keys group together, which
    flags them — the strict reading of a primary-key constraint."""
    check = name or f"unique({','.join(keys)})"
    return df.agg(
        F.lit(check).alias("check"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys]))
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def expect_ref_integrity(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """FK check: violations = child rows whose key has no parent (one
    left-anti join; Spark broadcasts the parent key side when small, AQE
    otherwise)."""
    check = name or f"fk({child_key}->{parent_key})"
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    totals = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return (
        orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .crossJoin(F.broadcast(totals))
        .select(F.lit(check).alias("check"), "n_violations", "n_rows")
    )


def quality_report(*checks: DataFrame) -> DataFrame:
    """Union per-rule frames into (check, n_violations, n_rows, passed)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


def fd_violations(df: DataFrame, lhs: list[str], rhs: str) -> DataFrame:
    """Approximate-functional-dependency audit: how badly does
    ``lhs -> rhs`` hold? Returns one row with the classic g3 error —
    the minimum fraction of rows that must be removed for the FD to
    hold exactly (per lhs group, every row outside the group's majority
    rhs class is a violation).

    Profilers (Deequ, TANE-style discovery) use g3 to rank candidate
    keys and detect denormalization drift; the reference's schema-CSV
    validation (d2b_data/functions.py load_schema_csv) checks declared
    shapes, while this checks SEMANTIC invariants the schema can't.

    Scale shape: two cascaded aggregations — groupBy(lhs, rhs) with
    map-side partials collapses the table to the distinct-pair frame,
    then groupBy(lhs) reduces to per-group (total, majority) — both
    shuffle on keys, no window over raw rows, no collect. Output is a
    single row per audited FD.
    """
    pair = df.groupBy(*lhs, rhs).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    grp = pair.groupBy(*lhs).agg(
        F.sum("_n").cast("long").alias("_rows"),
        F.max("_n").cast("long").alias("_majority"),
        F.count(F.lit(1)).cast("long").alias("_classes"),
    )
    return grp.agg(
        F.lit(",".join(lhs)).alias("lhs"),
        F.lit(rhs).alias("rhs"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("_rows").cast("long").alias("n_rows"),
        F.sum(F.col("_rows") - F.col("_majority")).cast("long").alias("violations"),
        F.sum(F.when(F.col("_classes") > 1, 1).otherwise(0))
        .cast("long")
        .alias("violating_groups"),
    ).select(
        "lhs",
        "rhs",
        "n_groups",
        "n_rows",
        "violations",
        "violating_groups",
        F.round(
            F.col("violations").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("g3_error"),
    )


def k_anonymity_report(
    df: DataFrame, quasi_identifiers: list[str], small_k: int = 5
) -> DataFrame:
    """k-anonymity audit for a quasi-identifier set: the dataset's k is
    the SMALLEST equivalence-class size over the QI columns — any class
    below ~5 makes its members re-identifiable by linkage. Returns one
    row: k, class count, row count, and how much of the data sits in
    small (< ``small_k``) classes — the release/suppress dial for a
    data-sharing pipeline (complements the PII scrub/pseudonymization
    operators, which fix VALUES while this audits STRUCTURE).

    Two cascaded aggregations (QI-class sizes, then the summary) — the
    same shuffle shape as fd_violations; no windows, no collect."""
    cls = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return cls.agg(
        F.lit(",".join(quasi_identifiers)).alias("quasi_identifiers"),
        F.min("_n").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_n") < small_k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_in_small_classes"),
    ).select(
        "quasi_identifiers",
        "k",
        "n_classes",
        "n_rows",
        "rows_in_small_classes",
        F.round(
            F.col("rows_in_small_classes").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("small_class_fraction"),
    )


def l_diversity_report(
    df: DataFrame, quasi_identifiers: list[str], sensitive: str
) -> DataFrame:
    """l-diversity audit: k-anonymity is not enough when every member of
    an equivalence class shares the same SENSITIVE value (the homogeneity
    attack) — l is the smallest number of distinct sensitive values in
    any QI class. Returns one row: l, the count of classes with a single
    sensitive value, and the fraction of rows exposed in them."""
    cls = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.countDistinct(sensitive).cast("long").alias("_l"),
    )
    return cls.agg(
        F.lit(",".join(quasi_identifiers)).alias("quasi_identifiers"),
        F.lit(sensitive).alias("sensitive"),
        F.min("_l").cast("long").alias("l"),
        F.sum(F.when(F.col("_l") == 1, 1).otherwise(0))
        .cast("long")
        .alias("homogeneous_classes"),
        F.sum(F.when(F.col("_l") == 1, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("exposed_rows"),
        F.sum("_n").cast("long").alias("n_rows"),
    ).select(
        "quasi_identifiers",
        "sensitive",
        "l",
        "homogeneous_classes",
        "exposed_rows",
        "n_rows",
        F.round(
            F.col("exposed_rows").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("exposed_fraction"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    bucket_col: str,
    threshold: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li et al. 2007), completing the release trio
    with k_anonymity_report / l_diversity_report: l-diversity is not
    enough when a class's sensitive values are diverse but SKEWED
    relative to the table (the skewness attack) — t is the largest
    Earth Mover's Distance between any QI class's sensitive-value
    distribution and the global one. For an ORDERED sensitive attribute
    bucketed into m values, EMD = (1/(m-1)) * sum_i |cumsum_i(p - q)|.

    Scale shape: one (QI, bucket) count agg, one m-row global-
    distribution frame (broadcast), a QI-class x m grid fill (classes x
    m rows — the grid is broadcast-joined, never a window over rows),
    and a per-class window over the m ordered buckets — bounded frames
    (m is the bucket count, a constant). Returns one row: t, the
    worst class count above ``threshold``, and the exposed-row mass.
    """
    from pyspark.sql import Window

    qi = F.struct(*[F.col(c) for c in quasi_identifiers]).alias("_qi")
    counts = df.select(qi, F.col(bucket_col).alias("_b")).groupBy(
        "_qi", "_b"
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    buckets = counts.groupBy("_b").agg(F.sum("_n").alias("_gn"))
    total = counts.agg(F.sum("_n").alias("_tot"))
    glob = buckets.crossJoin(F.broadcast(total)).select(
        "_b", (F.col("_gn").cast("double") / F.col("_tot").cast("double")).alias("_q")
    )
    cls_tot = counts.groupBy("_qi").agg(F.sum("_n").cast("long").alias("_cn"))
    # class x bucket grid (fill absent buckets with 0) — glob is m rows
    grid = cls_tot.crossJoin(F.broadcast(glob))
    filled = grid.join(counts, ["_qi", "_b"], "left").select(
        "_qi",
        "_b",
        "_cn",
        "_q",
        (F.coalesce(F.col("_n"), F.lit(0)).cast("double") / F.col("_cn").cast("double")).alias("_p"),
    )
    w = Window.partitionBy("_qi").orderBy("_b")  # bounded: m buckets/class
    cum = filled.withColumn("_cum", F.sum(F.col("_p") - F.col("_q")).over(w))
    # m = 1 (single global bucket) means every class trivially matches
    # the global distribution: EMD is 0 by definition, and the 1/(m-1)
    # normalizer would be 0/0 (Spark NULL vs DuckDB NaN — oracle skew)
    per_class = cum.groupBy("_qi", "_cn").agg(
        F.when(
            F.count(F.lit(1)) > 1,
            F.sum(F.abs("_cum")) / (F.count(F.lit(1)) - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("_emd")
    )
    return per_class.agg(
        F.lit(",".join(quasi_identifiers)).alias("quasi_identifiers"),
        F.lit(bucket_col).alias("sensitive_bucket"),
        F.round(F.max("_emd"), 6).alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("_emd") > threshold, 1).otherwise(0))
        .cast("long")
        .alias("classes_above_threshold"),
        F.sum(F.when(F.col("_emd") > threshold, F.col("_cn")).otherwise(0))
        .cast("long")
        .alias("exposed_rows"),
        F.sum("_cn").cast("long").alias("n_rows"),
    ).select(
        "quasi_identifiers",
        "sensitive_bucket",
        "t",
        "n_classes",
        "classes_above_threshold",
        "exposed_rows",
        "n_rows",
        F.round(
            F.col("exposed_rows").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("exposed_fraction"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private-STYLE noisy group counts: Laplace(1/ε)
    noise added to each group's count via inverse-CDF sampling — the
    release shape used for public aggregate dashboards (count queries
    have sensitivity 1, so scale b = 1/ε).

    The "randomness" is DETERMINISTIC by design: the uniform draw is an
    md5 hash of (seed, group key) mapped to (-0.5, 0.5), then
    noise = -b · sign(u) · ln(1 - 2|u|). Deterministic noise is NOT
    private against an adversary who knows the seed — this is the
    engine/testing shape (hash-seeded like train_split/global_shuffle);
    swap the hash for a CSPRNG draw per release in production. The
    virtue here is replayability: the oracle and any audit re-derive
    the exact same release.

    Scale shape: one count agg, then a pure projection — the noise is
    computed from the group key alone, no second pass, no driver RNG.
    """
    b = 1.0 / float(epsilon)
    key = F.concat_ws("\x1f", F.lit(seed), *[F.col(c).cast("string") for c in group_cols])
    # 52 hash bits -> uniform in (0,1), then shift to (-0.5, 0.5);
    # +0.5/2^53 keeps u strictly inside the open interval so ln(1-2|u|)
    # is finite
    u = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double")
        / F.lit(float(2**52))
        - F.lit(0.5)
        + F.lit(0.5 / 2**53)
    )
    # round the draw to 9 decimals BEFORE any downstream arithmetic:
    # absorbs last-ulp libm ln() divergence across engines so replays
    # (and the DuckDB oracle) are bit-identical
    noise = F.round(
        -F.lit(b) * F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u)),
        9,
    ) + F.lit(0.0)
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
        .select(
            *group_cols,
            "true_count",
            noise.alias("noise"),
            F.greatest(
                F.lit(0.0),
                F.round(F.col("true_count") + noise, 6) + F.lit(0.0),
            ).alias("noisy_count"),
            F.lit(float(epsilon)).alias("epsilon"),
        )
        .orderBy(*group_cols)
    )
