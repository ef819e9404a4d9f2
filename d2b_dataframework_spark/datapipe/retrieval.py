"""Inverted-index batch retrieval: TF-IDF top-k documents per query.

Complements the corpus-scoring ops in ``text.py`` (``bm25_scores``
scores EVERY doc against ONE term set — a curation filter) with the
retrieval shape a RAG/search pipeline needs: a posting-list index and a
BATCH of queries, each answered with its own top-k.

Scale shape — the parts that matter at 100TB:

* the index is (term, doc_id, tf): one explode + one combine-heavy
  groupBy; build it once, write it bucketed by term, and every query
  batch after that is a broadcast-filtered scan of just the matching
  terms' postings (predicate pushdown on the term column);
* the query table is tiny by construction → broadcast both the
  term-filter semi-join and the per-term df/idf join — postings never
  shuffle to meet the queries;
* per-query top-k runs the two-stage salted ``grouped_topk``: a query
  batch has FEW groups (one per query) over potentially millions of
  scored docs — the exact situation the salted pre-rank exists for.

Determinism: idf is rounded to 6dp and fixed as DECIMAL(18,6); per-doc
scores are SUM(tf × idf) in exact decimal (order-independent), cast to
double only for output — the DuckDB oracle reproduces scores
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.aggregates import grouped_topk
from .text import tokens


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting list (term, doc_id, tf). One explode (per-row flatMap, no
    shuffle) + one groupBy(term, doc) with map-side combine."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def retrieve_topk(
    postings: DataFrame,
    queries: dict[str, list[str]],
    n_docs_df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF top-k per query over a posting-list index.

    ``queries`` maps query_id → term list; ``n_docs_df`` is a 1-row
    frame with column ``_n`` (corpus document count, double). Returns
    (query_id, rank, doc_id, score).
    """
    spark = postings.sparkSession
    qrows = [(qid, t) for qid, terms in queries.items() for t in terms]
    qterms = spark.createDataFrame(qrows, "query_id string, term string")

    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    df_per_term = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    idf = F.round(
        F.log((F.col("_n") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0))), 6
    ).cast("decimal(18,6)")
    term_weights = (
        qterms.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(n_docs_df))
        .select("query_id", "term", idf.alias("_idf"))
    )
    scored = (
        matched.join(F.broadcast(term_weights), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("tf") * F.col("_idf")).alias("_score_dec"))
        .select(
            "query_id",
            id_col,
            F.col("_score_dec").cast("double").alias("score"),
        )
    )
    return (
        grouped_topk(
            scored,
            keys=["query_id"],
            order_cols=[F.col("score").desc(), F.col(id_col).asc()],
            k=k,
            pre_salt=8,
            salt_on=id_col,
        )
        .select(
            "query_id",
            "rank",
            F.col(id_col).cast("long").alias(id_col),
            F.round("score", 6).alias("score"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of several per-query rankings (lexical +
    semantic is the classic pair): every (query, doc) scores
    ``sum over sources of 1/(k + rank)`` — the standard hybrid-search
    combiner (Cormack et al.; k=60 is the conventional damping).

    Each input needs (query_col, doc_col, rank_col); docs absent from a
    source simply contribute nothing (no imputation). Per-source terms
    are rounded to 12dp and summed as DECIMAL(28,12) — exact and
    order-independent, so the fused ranking is reproducible regardless
    of source order or partitioning (the engine's cross-engine
    determinism convention; see datapipe/graph.py). Output: (query_col,
    doc_col, rrf_score, rank) re-ranked by (score desc, doc asc),
    optionally truncated to ``top_k``.

    Scale shape: inputs are already top-k-sized per query (bounded), so
    the union + groupBy moves sources x k rows per query — never corpus
    rows; the re-rank window partitions by query.
    """
    from pyspark.sql import Window

    term = F.round(F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double")), 12)
    tagged = [
        r.select(
            F.col(query_col),
            F.col(doc_col),
            term.cast("decimal(28,12)").alias("_term"),
        )
        for r in rankings
    ]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t)
    fused = unioned.groupBy(query_col, doc_col).agg(
        F.round(F.sum("_term").cast("double"), 9).alias("rrf_score")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(doc_col).asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w).cast("long"))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.select(query_col, doc_col, "rrf_score", "rank")


def ndcg_at_k(
    ranked: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k per query over a ranked frame (query, rank starting at 1,
    graded integer relevance) — the retrieval-evaluation companion to
    :func:`rrf_fuse`: DCG = sum(rel / log2(rank+1)) over the top k,
    IDCG from the same relevance values re-ranked descending (ideal
    order), ndcg = DCG/IDCG (null when IDCG is 0 — no relevant docs).

    Two window passes over lists already truncated to k per query —
    work is |queries| x k rows, independent of corpus size. The log2 is
    the one transcendental; both engines evaluate ln(x)/ln(2) on IEEE
    doubles (same caveat class as the HLL linear-counting ln,
    documented there). Per-position terms are rounded to 6dp and summed
    as exact DECIMAL (the engine's order-independent-sum convention),
    so results reproduce under any partitioning. Returns
    (query, dcg, idcg, ndcg) rounded to 6.
    """
    top = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(rank_col).alias("_r"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    dcg_term = F.round(
        F.col("_rel") / log2(F.col("_r").cast("double") + F.lit(1.0)), 6
    ).cast("decimal(28,6)")
    iw = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_r").asc()
    )
    ideal_rank = F.row_number().over(iw)
    staged = top.select(
        "_q", dcg_term.alias("_dt"), ideal_rank.alias("_ir"), "_rel"
    )
    ideal_term = F.round(
        F.col("_rel") / log2(F.col("_ir").cast("double") + F.lit(1.0)), 6
    ).cast("decimal(28,6)")
    agg = staged.groupBy("_q").agg(
        F.sum("_dt").cast("double").alias("dcg"),
        F.sum(ideal_term).cast("double").alias("idcg"),
    )
    return agg.select(
        F.col("_q").alias(query_col),
        "dcg",
        "idcg",
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
        ).alias("ndcg"),
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al.) between two ranked
    lists — the top-weighted "did my ranking change?" metric for
    retrieval / feed regression testing: rbo@k = (1-p) * sum_{d<=k}
    p^(d-1) * |A_1..d ∩ B_1..d| / d.

    Depth-d overlap needs no per-depth set work: a doc in both lists
    contributes to every depth >= max(rank_a, rank_b), so one inner
    join + a depth-spine join computes all k overlaps. The p-powers are
    Python-computed doubles injected as literals on BOTH engine sides
    (repr round-trip — no cross-engine pow()), per-depth terms rounded
    then decimal-summed (order-independent). Returns one row
    (n_common, rbo)."""
    spark = a.sparkSession
    ra = a.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("_id"), F.col(rank_col).alias("_ra")
    )
    rb = b.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("_id"), F.col(rank_col).alias("_rb")
    )
    both = ra.join(rb, "_id").select(
        F.greatest("_ra", "_rb").alias("_md")
    )
    depths = spark.createDataFrame(
        [(d, p ** (d - 1)) for d in range(1, k + 1)], "d long, w double"
    )
    per_depth = (
        both.join(F.broadcast(depths), F.col("_md") <= F.col("d"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("_ov"))
    )
    term = F.round(
        F.col("w") * F.col("_ov") / F.col("d").cast("double"), 6
    ).cast("decimal(28,6)")
    agg = per_depth.agg(
        F.coalesce(F.sum(term), F.lit(0).cast("decimal(28,6)"))
        .cast("double")
        .alias("_s"),
        F.coalesce(F.max("_ov"), F.lit(0.0)).cast("long").alias("n_common"),
    )
    return agg.select(
        "n_common",
        F.round((F.lit(1.0) - F.lit(float(p))) * F.col("_s"), 6).alias("rbo"),
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    max_df: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs document similarity over sparse TF-IDF vectors — the
    term-partitioned self-join (the classic DISCO/DIMSUM shape): two
    docs can only be similar if they share a term, so candidate pairs
    come from joining the posting list with itself per term, never from
    a cross product.

    ``max_df`` is the scale guard: a term appearing in more than
    ``max_df`` documents contributes O(df^2) candidate pairs while
    carrying ~zero discriminative weight (its idf is near the floor) —
    those hub terms are dropped BEFORE the self-join, bounding join
    fan-out the same way containment_pairs caps hot shingles. Weights
    and dot products are exact decimals (idf rounded to 6dp, fixed
    DECIMAL); only the final norm division runs in doubles.

    Returns (id_a, id_b, cosine) for pairs with cosine >= threshold,
    id_a < id_b.
    """
    posts = inverted_index(df, text_col, id_col).select(
        "term", F.col(id_col).alias("_doc"), "tf"
    )
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("_n"))
    dfreq = posts.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    kept = dfreq.filter(F.col("_df") <= max_df)
    idf = F.round(
        F.log(F.col("_n") / F.col("_df").cast("double")), 6
    ).cast("decimal(18,6)")
    weighted = (
        posts.join(kept, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term", "_doc",
            (F.col("tf").cast("decimal(18,0)") * idf).alias("_w"),
        )
        .persist()
    )
    norms = weighted.groupBy("_doc").agg(
        F.sum(F.col("_w") * F.col("_w")).alias("_n2")
    )
    a = weighted.select(
        "term", F.col("_doc").alias("_da"), F.col("_w").alias("_wa")
    )
    b = weighted.select(
        "term", F.col("_doc").alias("_db"), F.col("_w").alias("_wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("_da") < F.col("_db"))
        .groupBy("_da", "_db")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    na = norms.select(F.col("_doc").alias("_da"), F.col("_n2").alias("_n2a"))
    nb = norms.select(F.col("_doc").alias("_db"), F.col("_n2").alias("_n2b"))
    cos = F.round(
        F.col("_dot").cast("double")
        / (F.sqrt(F.col("_n2a").cast("double")) * F.sqrt(F.col("_n2b").cast("double"))),
        6,
    )
    from .cache import track

    return track(
        dots.join(na, "_da")
        .join(nb, "_db")
        .select(
            F.col("_da").alias("id_a"),
            F.col("_db").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold),
        weighted,
    )
