"""Distributed k-means over embedding columns (Lloyd's algorithm).

Built for training-data curation at corpus scale: cluster the embedding
space, then sample/balance/inspect per cluster (semantic dedup, domain
discovery, diversity-aware mixing — the FAISS/k-means stage of a modern
LLM data pipeline, re-expressed on Spark DataFrames).

Scale shape (the same one MLlib's KMeans uses, minus its RDD layer):

* **Assignment is map-side.** Centroids are model parameters — a
  k×dim table collected to the driver and embedded as ONE constant-folded
  ``from_json`` literal (same trick as :func:`similarity.ivf_topk`), so
  each iteration's assignment is a pure projection over the corpus scan:
  no crossJoin, no Window, no Exchange.
* **The update step aggregates k×dim cells, not rows.** ``posexplode``
  fans each vector into (cluster, dim, value) cells whose partial sums
  combine map-side; the shuffle moves ~k×dim×n_partitions partial rows,
  independent of corpus size. The driver materializes k×dim longs —
  exactly the "reduce cluster sums" step of every distributed Lloyd.
* **Iterations are driver-coordinated jobs** (2-20 passes over the
  corpus). Each pass is scan + projection + tiny agg: embarrassingly
  parallel, no state beyond the k×dim model.

Cross-engine determinism (what makes a SQL oracle possible at all):
embeddings are quantized to integers (``round(x*1000)``), so cluster
sums, counts, and dot products are EXACT integer arithmetic that any
engine reproduces bit-for-bit in float64 (all magnitudes ≪ 2^53).
Distances are compared via the rational decomposition

    ``d_j = x·x − (2·x·s_j)/n_j + (s_j·s_j)/n_j²``

where ``s_j`` (cluster sum vector) and ``n_j`` (cluster size) are exact
integers: the only roundings are two exact-integer-input divisions and
two adds/subs of identical doubles — bit-identical on Spark, DuckDB,
or NumPy, with NO dependence on summation order (integer sums are exact
in any order). Ties break to the lowest cluster id.

Reference parity: the reference has no clustering operator — this is
part of the LLM-data-pipeline surface the build brief adds on top of
the reference's API (see COVERAGE.md), sited next to its embedding
sources (`d2b_data/README.md` pipeline docs).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000


def _quantized(vec: Column) -> Column:
    """Integer-valued double array: round(x*1000). Exact in float64."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _centroid_literal(cents: list[dict]) -> Column:
    """k centroids as ONE constant-folded literal (see ivf_topk's note on
    why from_json beats a nested F.lit tree: ~5 expression nodes instead
    of k×dim py4j-built ones)."""
    return F.from_json(
        F.lit(json.dumps(cents)),
        "array<struct<cid: bigint, s: array<double>, ss: double, n: double>>",
    )


def _assign(qv: Column, cent_arr: Column) -> Column:
    """struct<dist, cid> of the nearest centroid (min dist, then min cid).

    dist = (x·x − (2·(x·s))/n) + ss/n² — see module docstring for why
    this exact decomposition is engine-portable.
    """
    xx = _dot(qv, qv)
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            (
                (xx - (_dot(qv, c["s"]) * F.lit(2.0)) / c["n"])
                + c["ss"] / (c["n"] * c["n"])
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_min(scored)


def _assign_pandas_udf(cents: list[dict]):
    """Arrow-batched assignment twin: one int64 matmul per batch instead
    of k×dim interpreted HOF lambdas per row. BIT-IDENTICAL to
    :func:`_assign` by construction, not by luck: x·x, x·s and 2·(x·s)
    are exact integer values (every int64 add is exact, so summation
    order is irrelevant — no SIMD-vs-fold divergence possible), the two
    divisions see identical operands, and the final sub/add are single
    IEEE ops on identical doubles. Ties break to the lowest cid on both
    paths (cents are cid-sorted; np.argmin returns the first minimum)."""
    S = np.array([c["s"] for c in cents], dtype=np.int64)  # k × dim
    SS = np.array([c["ss"] for c in cents], dtype=np.float64)
    N = np.array([c["n"] for c in cents], dtype=np.float64)
    CIDS = np.array([c["cid"] for c in cents], dtype=np.int64)

    def assign(emb):  # hint-free: plain scalar pandas UDF
        Q = np.stack(emb.to_numpy()).astype(np.int64)  # integer-valued
        XX = (Q * Q).sum(axis=1).astype(np.float64)  # exact ints
        T2 = (2 * (Q @ S.T)).astype(np.float64)  # exact ints
        D = (XX[:, None] - T2 / N[None, :]) + SS[None, :] / (N * N)[None, :]
        idx = np.argmin(D, axis=1)
        rows = np.arange(len(idx))
        return pd.DataFrame({"cid": CIDS[idx], "dist": D[rows, idx]})

    return F.pandas_udf(assign, "struct<cid: bigint, dist: double>")


def kmeans_assignments(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Run ``iters`` Lloyd assignment passes; return the final assignment
    ``(id, cluster, dist)`` where dist is the exact quantized squared-L2
    distance to the final centroid, rounded to 6 for display.

    Seeding is deterministic-by-construction: the ``k`` lowest-id
    vectors are the initial centroids (swap in kmeans|| at scale; the
    plan shape is identical). Clusters that receive no members drop out
    of subsequent iterations (never happens on real corpora with sane
    k; defined behavior, mirrored by the SQL oracle, if it does).

    ``vectorized=True`` assigns via the Arrow-batched twin
    (:func:`_assign_pandas_udf` — equivalence guaranteed by exact
    integer arithmetic, equivalence-tested too); ``False`` keeps the
    pure-Catalyst HOF path.
    """
    base = corpus.select(
        F.col(id_col).alias("vid"), _quantized(F.col(vec_col)).alias("qv")
    ).persist()

    # Seed: s = the vector itself, n = 1 (so s/n is exactly the vector).
    seed_rows = sorted(
        base.filter(F.col("vid") < k).collect(), key=lambda r: r["vid"]
    )
    cents = [
        {
            "cid": int(r["vid"]),
            "s": [float(v) for v in r["qv"]],
            "ss": float(sum(int(v) * int(v) for v in r["qv"])),
            "n": 1.0,
        }
        for r in seed_rows
    ]

    assigned = None
    for it in range(iters):
        if vectorized:
            best = _assign_pandas_udf(cents)(F.col("qv"))
        else:
            best = _assign(F.col("qv"), _centroid_literal(cents))
        assigned = base.select(
            "vid",
            "qv",
            best["cid"].alias("cluster"),
            best["dist"].alias("dist"),
        )
        if it == iters - 1:
            break
        # Update: exact integer cluster sums via k×dim cell aggregation.
        cells = (
            assigned.select(
                "cluster", F.posexplode(F.col("qv")).alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.sum(F.col("val").cast("long")).alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        counts: dict[int, int] = {}
        for row in cells:
            by_cid.setdefault(int(row["cluster"]), {})[int(row["dim"])] = int(row["s"])
            counts[int(row["cluster"])] = int(row["n"])
        cents = [
            {
                "cid": cid,
                "s": [float(dims[i]) for i in range(len(dims))],
                "ss": float(sum(v * v for v in dims.values())),
                "n": float(counts[cid]),
            }
            for cid, dims in sorted(by_cid.items())
        ]

    out = assigned.select(
        "vid", "cluster", F.round(F.col("dist"), 6).alias("dist")
    )
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(out, base)


def cluster_profile(assignments: DataFrame) -> DataFrame:
    """Per-cluster size + mean distance (curation dashboard stage)."""
    return assignments.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_members"),
        (
            F.sum(F.col("dist").cast("decimal(28,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_dist"),
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid + inertia over an embedding column — the
    class-prototype / pooled-embedding stage (nearest-class-mean
    classifiers, per-domain semantic profiles, drift baselines).

    Exact quantized arithmetic end to end (the module's convention):
    centroids are rational (integer cell sums / count) and the inertia
    sum_i ||x_i - c||^2 uses the decomposition sum(x.x) - (s.s)/n —
    computed from EXACT integer totals in one pass, so the result is
    bit-identical on any engine and partitioning.

    One k x dim cell aggregation (posexplode + partial-combined sum):
    the shuffle carries |labels| x dim rows, independent of corpus
    size. Returns (label, n_members, centroid_micro_csv: per-dim mean
    in MICRO-units (1e-6 of the raw embedding scale, half-up integer),
    inertia_quant: integer inertia in quantized units — divide by 1e6
    for the raw scale)."""
    # Same up-front hygiene as centroid_outliers: a null vector would be
    # counted in n_members while contributing nothing to the cell sums
    # (silently deflating the centroid), and null labels would form a
    # spurious group — exclude both.
    q = df.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"), _quantized(F.col(vec_col)).alias("qv")
    )
    cells = (
        q.select("label", F.posexplode(F.col("qv")).alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.sum(F.col("val").cast("long")).alias("s"))
    )
    per_label = q.select(
        "label",
        _dot(F.col("qv"), F.col("qv")).alias("_xx"),
    ).groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("_xx").cast("double").alias("_sxx"),
    )
    ss = cells.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("double").alias("_ss")
    )
    sorted_cells = cells.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("_cells")
    )
    joined = per_label.join(ss, "label").join(sorted_cells, "label")
    n_dbl = F.col("n_members").cast("double")
    # Micro-unit INTEGER components with explicit floor(x+0.5) half-up
    # (the quantize_int8 convention): rational means s/(n*1000) land on
    # exact decimal/dyadic ties routinely, where round()/printf rounding
    # conventions diverge across engines (Java half-up vs C half-even);
    # floor on a double is exact everywhere.
    centroid = F.concat_ws(
        ",",
        F.transform(
            F.col("_cells"),
            lambda e: F.floor(
                e["s"].cast("double") * F.lit(1000.0) / n_dbl + F.lit(0.5)
            ).cast("long").cast("string"),
        ),
    )
    inertia = (
        F.floor(
            (F.col("_sxx") - F.col("_ss") / n_dbl) + F.lit(0.5)
        ).cast("long")
    )
    return joined.select(
        "label",
        "n_members",
        centroid.alias("centroid_micro_csv"),
        inertia.alias("inertia_quant"),
    )


def centroid_outliers(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_threshold: float = 4.0,
) -> DataFrame:
    """Embedding outlier detection against class prototypes: each
    vector scores ``d^2 / mean_d^2`` vs its label's centroid — the
    mislabeled/out-of-distribution screen a curation pipeline runs over
    annotated embeddings (score 1 = typical member; >> 1 = far from its
    class). Flags rows with score > ``score_threshold``.

    Two passes, both scale-shaped: (1) the k x dim cell aggregate from
    :func:`label_centroids` materializes per-label rational centroids +
    moment totals on the driver (|labels| x dim numbers — model
    parameters); (2) a pure map-side projection against that
    constant-folded literal computes every distance and score — no
    join, no shuffle beyond pass 1's bounded cell agg. Arithmetic is
    the module's exact quantized rational decomposition end to end, so
    scores reproduce cross-engine.

    Returns flagged rows only: (id, label, score).
    """
    # Labels match by STRING image so integral and string label columns
    # both work; null labels / null vectors are excluded up front (they
    # have no class to score against).
    q = df.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_label"),
        F.col(label_col).cast("string").alias("_lkey"),
        _quantized(F.col(vec_col)).alias("qv"),
    )
    cells = (
        q.select("_lkey", F.posexplode(F.col("qv")).alias("dim", "val"))
        .groupBy("_lkey", "dim")
        .agg(F.sum(F.col("val").cast("long")).alias("s"))
        .collect()
    )
    stats = (
        q.select("_lkey", _dot(F.col("qv"), F.col("qv")).alias("_xx"))
        .groupBy("_lkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_xx").cast("double").alias("sxx"),
        )
        .collect()
    )
    sums: dict[str, dict[int, int]] = {}
    for r in cells:
        sums.setdefault(str(r["_lkey"]), {})[int(r["dim"])] = int(r["s"])
    payload = []
    for r in stats:
        lab = str(r["_lkey"])
        dims = sums[lab]
        s = [float(dims[i]) for i in range(len(dims))]
        payload.append(
            {
                "label": lab,
                "s": s,
                "ss": float(sum(v * v for v in s)),
                "n": float(int(r["n"])),
                "sxx": float(r["sxx"]),
            }
        )
    lit = F.from_json(
        F.lit(json.dumps(payload)),
        "array<struct<label: string, s: array<double>, ss: double, n: double, sxx: double>>",
    )
    # entry for THIS row's label (labels are bounded; filter is a tiny HOF)
    entry = F.element_at(
        F.filter(lit, lambda e: e["label"] == F.col("_lkey")), 1
    )
    staged = q.select("_id", "_label", "qv", entry.alias("_e")).filter(
        F.col("_e").isNotNull()
    )  # _label keeps the ORIGINAL type for output; _lkey was match-only
    e = F.col("_e")
    xx = _dot(F.col("qv"), F.col("qv"))
    d2 = xx - (F.lit(2.0) * _dot(F.col("qv"), e["s"])) / e["n"] + e["ss"] / (
        e["n"] * e["n"]
    )
    mean_d2 = (e["sxx"] - e["ss"] / e["n"]) / e["n"]
    # A label whose members are all identical (any singleton label) has
    # mean_d2 = 0: 0/0 = NaN, and Spark orders NaN above every number,
    # so an unguarded score would flag EVERY member of a degenerate
    # label. Null score (unflagged) instead — mirrors grouped_linreg's
    # var_x > 0 guard.
    score = F.when(mean_d2 > F.lit(0.0), F.round(d2 / mean_d2, 6))
    return (
        staged.select(
            F.col("_id").alias(id_col),
            F.col("_label").alias(label_col),
            score.alias("score"),
        )
        .filter(F.col("score") > score_threshold)
    )
