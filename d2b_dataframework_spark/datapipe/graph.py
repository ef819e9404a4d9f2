"""Iterative graph algorithms as DataFrame programs.

Connected components (datapipe/dedup.py:547,623) covers the dedup
clustering use; this module adds PageRank — the standard importance
score for link/interaction graphs (document link graphs for crawl
prioritization, user-item interaction graphs for popularity priors).

Pregel-on-DataFrames shape: one iteration = join(edges, ranks) on src
(shuffle on src) + groupBy(dst) (shuffle on dst). At 100TB scale:

* pre-partition ``edges`` by src once and persist — every iteration
  reuses the exchange;
* ranks stay (node, double) — narrow rows, the only growing cost is
  plan lineage, which ``pagerank`` severs with an eager
  ``localCheckpoint`` every ``checkpoint_every`` iterations;
* contributions are summed as DECIMAL after rounding — exact,
  order-independent, so results are reproducible across partitionings
  AND engines (the DuckDB oracle runs the identical arithmetic).

Cross-engine determinism convention (see plans/queries.py module doc):
per-edge math is IEEE double with fixed parenthesization, rounded to
12dp, summed exactly as DECIMAL(28,12), iterated; final report rounds
to 9dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import track


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (pass both
    directions for an undirected graph). Returns (node, rank) for every
    node; ranks sum to ~1 when the graph has no dangling nodes (a node
    with no out-edges leaks its mass — add self-loops upstream if that
    matters).

    The damping complement is computed in-engine as ``1.0 - damping``
    (not pre-computed in Python) so an oracle writing ``(1.0 - 0.85)``
    lands on the bit-identical IEEE double.

    ``checkpoint_every``: every k-th iteration the rank frame is
    checkpointed (eager), severing the accumulated lineage. Without it
    each iteration's plan embeds every previous iteration — at 10+
    iterations analysis/codegen time grows superlinearly. Checkpointing
    keeps per-iteration cost flat (tools/scale_probe.py probes 10
    iterations). Set 0/None to disable (e.g. for plan-inspection tests).

    Fault-tolerance tradeoff: when ``spark.sparkContext`` has a
    checkpoint dir set (``setCheckpointDir``) a RELIABLE ``checkpoint()``
    is used — blocks live in the fault-tolerant store and survive
    executor loss; on a real cluster set the dir. Otherwise this falls
    back to ``localCheckpoint``, which is FASTER but NON-reliable: blocks
    live on executors and lineage is severed, so an executor loss fails
    the job outright (it cannot recompute). That is the right default in
    local mode, where executor loss means the whole JVM died anyway.
    """
    # Persist the edge list FIRST and derive nodes/outdeg from the
    # persisted frame — deriving them from the raw argument would replay
    # its (possibly expensive: distinct over a fact scan) lineage once
    # per derivation.
    e = edges.select(src, dst).persist()
    # explode, not union-of-two-selects: one scan of e (a union's two
    # legs each replay the input within the same job before the cache
    # has materialized)
    nodes = (
        e.select(F.explode(F.array(src, dst)).alias("node")).distinct().persist()
    )
    outdeg = e.groupBy(src).agg(F.count(F.lit(1)).alias("_outdeg"))
    # pre-join the out-degree onto the edges once — saves one join per
    # iteration (the iteration loop then touches a single cached frame)
    ew = e.join(outdeg, src).persist()
    # One tiny driver action: |nodes| (also materializes the nodes cache
    # before any broadcast stage can race it). Inlining n as a literal
    # keeps the per-iteration plans free of repeated count-agg +
    # broadcast-exchange stages — a broadcast executes before the main
    # job and would otherwise recompute the node derivation every
    # iteration. n is an exact integer; its double form is identical to
    # the oracle's count(*)::DOUBLE.
    n = F.lit(float(nodes.count()))

    if seeds is None:
        # uniform teleport — the classic global PageRank
        teleport = (F.lit(1.0) - F.lit(float(damping))) / n
        base = nodes
        ranks = nodes.select("node", F.round(F.lit(1.0) / n, 12).alias("rank"))
    else:
        # personalized: restart mass concentrated on the seed set —
        # ranks become proximity-to-seeds scores (local community /
        # related-items ranking). Seed flag joined onto the node frame
        # ONCE and persisted; per-node teleport is (1-d)/|S| on seeds,
        # 0 elsewhere. |S| counted over seeds ∩ nodes so stray seed ids
        # cannot leak mass.
        seed_nodes = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .join(nodes, "node", "left_semi")
        )
        s = F.lit(float(seed_nodes.count()))
        base = (
            nodes.join(
                seed_nodes.withColumn("_seed", F.lit(1)), "node", "left"
            )
            .select(
                "node",
                F.when(
                    F.col("_seed") == 1,
                    (F.lit(1.0) - F.lit(float(damping))) / s,
                )
                .otherwise(F.lit(0.0))
                .alias("_tp"),
                F.when(F.col("_seed") == 1, F.round(F.lit(1.0) / s, 12))
                .otherwise(F.lit(0.0))
                .alias("_r0"),
            )
            .persist()
        )
        teleport = F.col("_tp")
        ranks = base.select("node", F.col("_r0").alias("rank"))
    for it in range(int(iterations)):
        if checkpoint_every and it > 0 and it % int(checkpoint_every) == 0:
            # sever lineage: ranks is a narrow (node, double) frame, so
            # the checkpoint materialization is cheap relative to the
            # quadratic plan growth it prevents; reliable checkpoint()
            # when a checkpoint dir is configured (cluster), local
            # otherwise (see docstring for the tradeoff)
            sc = ranks.sparkSession.sparkContext
            if sc.getCheckpointDir() is not None:
                ranks = ranks.checkpoint(eager=True)
            else:
                ranks = ranks.localCheckpoint(eager=True)
        contrib = (
            ew.join(ranks.withColumnRenamed("node", src), src)
            .select(
                F.col(dst).alias("node"),
                F.round(
                    (F.lit(float(damping)) * F.col("rank"))
                    / F.col("_outdeg").cast("double"),
                    12,
                )
                .cast("decimal(28,12)")
                .alias("_c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = base.join(sums, "node", "left").select(
            "node",
            F.round(
                teleport + F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
    handles = [nodes, ew, e] if seeds is None else [nodes, ew, e, base]
    return track(ranks, *handles)


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected edge list (pass each edge once in either direction;
    duplicates and self-loops are removed here).

    Degree-ordered orientation — the classic trick that makes triangle
    enumeration feasible on power-law graphs: every edge is directed
    from its lower-(degree, id) endpoint to the higher one, so the
    wedge self-join fans out from each node's ORIENTED out-degree,
    bounding total wedge volume by O(E^1.5) regardless of hub size (a
    10M-degree hub contributes ~0 oriented out-edges instead of 10^14
    wedges). Wedges close into triangles via one more equi-join against
    the oriented edge list.

    Returns ONE row: (n_nodes, n_edges, n_triangles, n_wedges,
    global_clustering) where n_wedges counts unordered open+closed
    2-paths (sum over nodes of deg*(deg-1)/2) and global_clustering =
    3*triangles/wedges rounded to 9dp (0.0 when wedge-free).

    Scale shape: 3 shuffles total (degree agg, wedge join on the pivot
    node, closure join on the (lo, hi) pair) — each moving id-only
    rows; no row ever carries payload columns.
    """
    a, b = F.col("_a"), F.col("_b")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_a"),
            F.greatest(F.col(src), F.col(dst)).alias("_b"),
        )
        .filter(a != b)
        .distinct()
        .persist()
    )
    deg = (
        und.select(a.alias("_n"))
        .unionAll(und.select(b.alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .persist()
    )
    # Orient low (deg, id) -> high (deg, id): ties broken by node id, so
    # the orientation is a strict total order and each edge appears once.
    da = deg.select(F.col("_n").alias("_a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("_n").alias("_b"), F.col("_deg").alias("_db"))
    oriented = (
        und.join(da, "_a")
        .join(db, "_b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (a < b)),
                F.struct(a.alias("s"), b.alias("t")),
            )
            .otherwise(F.struct(b.alias("s"), a.alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("_s"), F.col("e.t").alias("_t"))
        .persist()
    )
    # Wedges pivoting at _s: unordered pairs of its oriented out-edges.
    w1 = oriented.select(F.col("_s"), F.col("_t").alias("_u"))
    w2 = oriented.select(F.col("_s"), F.col("_t").alias("_v"))
    wedges = w1.join(w2, "_s").filter(F.col("_u") < F.col("_v"))
    # A wedge closes iff (u, v) is an edge — check the UNDIRECTED canon
    # (u < v already holds) so the closing edge's own orientation is moot.
    tri = wedges.join(
        und.select(F.col("_a").alias("_u"), F.col("_b").alias("_v")),
        ["_u", "_v"],
        "left_semi",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    counts = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    node_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("_deg") * (F.col("_deg") - 1) / 2).cast("long").alias("n_wedges"),
    )
    out = (
        tri.crossJoin(counts)
        .crossJoin(node_stats)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 9
                )
            )
            .alias("global_clustering"),
        )
    )
    return track(out, und, deg, oriented)


def kcore_filter(
    edges: DataFrame,
    k: int,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration k-core peel over an undirected edge list (pass
    canonical ``src < dst`` pairs): repeatedly drop nodes whose degree
    among the still-alive subgraph is below ``k`` — the engagement /
    spam-ring screen (a node's final survival needs k neighbors that
    themselves survive). Fixed ``iterations`` keeps the operator
    deterministic and oracle-replayable (unrolled stages); peeling
    converges when an iteration removes nothing, so choose iterations
    >= the longest peel chain you care about (each extra iteration is
    one degree-agg + one semi-join — linear cost, no plan blowup).

    Returns the surviving (node, degree) rows — degrees measured in the
    FINAL surviving subgraph.
    """
    e = edges.select(src, dst).persist()
    # Undirected incidence, hash-partitioned on the node id and
    # persisted ONCE: every round's degree aggregation groups by the
    # same key, so the single up-front exchange is reused by all
    # iterations+1 aggs (guide §2.4 "two operations keyed the same way
    # can share one exchange").
    inc = (
        e.select(F.col(src).alias("node"), F.col(dst).alias("peer"))
        .unionAll(e.select(F.col(dst).alias("node"), F.col(src).alias("peer")))
        .repartition("node")
        .persist()
    )

    # Peel over a SHRINKING incidence frame: alive sets only ever
    # shrink, so inc ∩ alive_t² == (inc ∩ alive_{t-1}²) ∩ alive_t² —
    # filtering the previous round's survivors is identical to
    # re-filtering the full list (the original shape) but each round's
    # joins and agg run over a monotonically smaller frame, and round
    # 1's two all-nodes semi-joins (semantic no-ops) disappear
    # entirely. Semi-joins, not broadcast hints: the alive set starts
    # as ALL nodes, so a hint would be wrong at scale — AQE downgrades
    # to broadcast on its own once peeling shrinks the set.
    #
    # Persist every round's alive set and shrunk incidence: both are
    # consumed twice (the two semi-join sides / this round's agg plus
    # next round's filter) and iteration k's plan embeds every previous
    # iteration — unpersisted, the peel chain replays super-linearly
    # (the pagerank lineage lesson; measured 16.9s -> a fraction at
    # sf0.1). Handles are tracked for datapipe.cache.release.
    handles: list[DataFrame] = [e, inc]
    alive_inc = inc
    for _ in range(int(iterations)):
        alive = (
            alive_inc.groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
            .filter(F.col("degree") >= k)
            .select("node")
            .persist()
        )
        handles.append(alive)
        alive_inc = (
            alive_inc.join(
                alive.withColumnRenamed("node", "peer"), "peer", "left_semi"
            )
            .join(alive, "node", "left_semi")
            .persist()
        )
        handles.append(alive_inc)
    out = (
        alive_inc.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select("node", F.col("degree").cast("long").alias("degree"))
    )
    return track(out, *handles)


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Multi-source BFS over an undirected edge list: the minimum hop
    distance from ANY seed node, capped at ``max_hops`` — the
    blast-radius / influence-frontier query (how far does an incident,
    a recall, or a promotion propagate through the co-purchase or
    interaction graph). Unreached nodes are absent from the output.

    Pregel shape, one round per hop: frontier ⋈ adjacency (shuffle on
    node id), anti-join against the visited set so each node is
    expanded exactly once — the standard distributed BFS where total
    work is O(E) per round and the frontier/visited frames stay
    (node: long, hop: int) narrow rows. Every round's visited set is
    persisted (the k-core lesson: both the join and the next round's
    anti-join consume it, and round k's plan embeds rounds 0..k-1), and
    every ``checkpoint_every`` hops the visited frame's LINEAGE is
    severed with checkpoint/localCheckpoint (the pagerank pattern above)
    — persist alone truncates execution but the analyzed plan still
    grows per hop, so analysis time would bite at 6+ hops without it.
    Handles are tracked for :func:`datapipe.cache.release`.

    Deterministic: hop distances are a pure function of the graph, so
    the result is partitioning- and engine-independent (DuckDB oracle:
    a recursive CTE with ``min(hop)``).
    """
    e = edges.select(src, dst).persist()
    adj = (
        e.select(F.col(src).alias("node"), F.col(dst).alias("peer"))
        .unionAll(e.select(F.col(dst).alias("node"), F.col(src).alias("peer")))
        .persist()
    )
    handles: list[DataFrame] = [e, adj]
    frontier = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    visited = frontier.select("node", F.lit(0).alias("hop")).persist()
    handles.append(visited)
    for hop in range(1, int(max_hops) + 1):
        reached = (
            adj.join(frontier, "node")
            .select(F.col("peer").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(hop).alias("hop"))
        )
        visited = visited.unionAll(reached)
        if checkpoint_every and hop % int(checkpoint_every) == 0:
            # sever lineage: visited is a narrow (node, hop) frame, so
            # materializing it is cheap relative to the per-hop plan
            # growth it prevents; reliable checkpoint() on a cluster
            # with a checkpoint dir, localCheckpoint() otherwise
            sc = visited.sparkSession.sparkContext
            if sc.getCheckpointDir() is not None:
                visited = visited.checkpoint(eager=True)
            else:
                visited = visited.localCheckpoint(eager=True)
            # localCheckpoint(eager=True) materializes RDD blocks that
            # only unpersist() releases — track the frame exactly like
            # the persist branch or long-lived sessions leak storage
            # (reliable checkpoint(): unpersist is a harmless no-op).
            handles.append(visited)
        else:
            visited = visited.persist()
            handles.append(visited)
        # next frontier reads back out of the PERSISTED visited frame —
        # deriving it from `reached` directly would replay this round's
        # expansion a second time inside the next round's plan
        frontier = visited.filter(F.col("hop") == hop).select("node")
    out = visited.select("node", F.col("hop").cast("int").alias("hop"))
    return track(out, *handles)


def jaccard_link_prediction(
    edges: DataFrame,
    max_pivot_degree: int = 50,
    min_common: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Common-neighbor link prediction over an undirected edge list
    (canonical ``src < dst`` pairs): for node pairs NOT already joined
    by an edge, count shared neighbors through pivot nodes of degree <=
    ``max_pivot_degree`` and score jaccard = common / (deg_a + deg_b -
    common) — the "customers also bought" / friend-suggestion candidate
    generator.

    Scale shape: candidate pairs are generated by a self-join on the
    PIVOT node (posting-list blocking, the tfidf_cosine_pairs pattern)
    — never an all-pairs product — and the hub cap bounds each pivot's
    fan-out at max_pivot_degree^2 pairs, so a celebrity node cannot
    quadratically explode the shuffle. Degrees are measured on the FULL
    graph (the cap only limits which pivots GENERATE candidates, making
    ``common`` a documented lower bound through hubby neighborhoods).
    The known-edge screen is a left-anti join on the canonical pair.
    """
    e = edges.select(src, dst).persist()
    und = e.select(F.col(src).alias("node"), F.col(dst).alias("peer")).unionAll(
        e.select(F.col(dst).alias("node"), F.col(src).alias("peer"))
    )
    # deg is consumed THREE times (the pivot cap filter and the two
    # score-join sides) and piv TWICE (both legs of the wedge
    # self-join); unpersisted, each consumer replays the degree agg /
    # cap join over the full incidence list (guide §5). Both are
    # node-/edge-sized narrow frames.
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    deg.persist()
    piv = (
        und.withColumnRenamed("node", "pivot")
        .join(
            deg.filter(F.col("deg") <= max_pivot_degree)
            .select(F.col("node").alias("pivot")),
            "pivot",
        )
    )
    piv.persist()
    a = piv.select("pivot", F.col("peer").alias("na"))
    b = piv.select("pivot", F.col("peer").alias("nb"))
    cand = (
        a.join(b, "pivot")
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    non_edge = cand.join(
        e.select(F.col(src).alias("na"), F.col(dst).alias("nb")),
        ["na", "nb"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("na"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("nb"), F.col("deg").alias("_db"))
    scored = (
        non_edge.join(da, "na")
        .join(db, "nb")
        .select(
            "na",
            "nb",
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("_da") + F.col("_db") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return track(scored, e, deg, piv)


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, made DETERMINISTIC): every node starts with its own id as
    label; each iteration relabels every node with the most frequent
    label among its neighbors, ties broken by the SMALLEST label, all
    nodes updating from the previous iteration's labels (no sequential
    order-dependence, no RNG — identical output on any engine/cluster
    layout). Isolated or tie-free convergence is typically reached in a
    handful of iterations; callers fix ``iterations`` so the oracle can
    unroll the same stages.

    Scale shape per iteration: one join of the (undirected, both
    directions materialized) edge list against the current label frame
    on the node key, one (node, label) count agg, one argmax-by-struct
    agg (map-side combinable, no window over the node set), one left
    join back to carry labels of neighbor-less nodes. Labels are node
    ids (longs) — the frame never exceeds |V| rows, and each iteration
    is persisted + released like pagerank to keep lineage flat.

    Returns (node, label) — final community assignment.
    """
    inc = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("peer"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("peer")))
        .persist()
    )
    nodes = inc.select("node").distinct()
    # labels carries a DISTINCT column name (_lnode) — it derives from
    # ``inc``, and a same-lineage self-join on an identically-named
    # column is ambiguous to the analyzer.
    labels = nodes.select(
        F.col("node").alias("_lnode"), F.col("node").alias("label")
    ).persist()
    handles: list[DataFrame] = [inc, labels]
    for _ in range(iterations):
        nb = inc.join(labels, inc.peer == labels._lnode, "inner").select(
            inc.node.alias("n"), F.col("label")
        )
        counts = nb.groupBy("n", "label").agg(F.count(F.lit(1)).alias("_c"))
        best = (
            counts.groupBy("n")
            .agg(
                F.min(
                    F.struct((-F.col("_c")).alias("nc"), F.col("label").alias("l"))
                ).alias("_b")
            )
            .select(F.col("n").alias("_bnode"), F.col("_b.l").alias("new_label"))
        )
        nxt = labels.join(
            best, labels._lnode == best._bnode, "left"
        ).select(
            F.col("_lnode"), F.coalesce("new_label", "label").alias("label")
        )
        # Sever lineage EVERY iteration: labels feeds the next plan
        # twice (the neighbor join and the carry-forward), so without a
        # checkpoint the logical plan doubles per iteration — analysis
        # cost blows up exponentially long before execution does.
        # LAZY truncation (eager=False): the plan is cut immediately —
        # the same analysis protection — but no per-iteration blocking
        # job runs; the whole iteration chain materializes in the ONE
        # action the caller triggers (measured −0.4 s vs eager at 3
        # iterations, sf0.1). Reliable checkpoint() when a dir is
        # configured (cluster), local otherwise (same tradeoff as
        # pagerank's docstring). Intermediate frames are tracked for
        # release instead of unpersisted mid-build (an unmaterialized
        # lazy checkpoint must keep its caching mark until the action).
        sc = nxt.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            nxt = nxt.checkpoint(eager=False)
        else:
            nxt = nxt.localCheckpoint(eager=False)
        handles.append(nxt)
        labels = nxt
    out = labels.select(F.col("_lnode").alias("node"), "label")
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(out, *handles)


def local_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_degree: int = 2,
) -> DataFrame:
    """Per-node local clustering coefficient: lcc(v) = 2 * t(v) /
    (deg(v) * (deg(v) - 1)) — how close each node's neighborhood is to
    a clique (the node-level refinement of triangle_stats' global
    coefficient; spam rings and tight communities surface as high-lcc
    nodes). Same degree-ordered orientation as triangle_stats (wedge
    volume O(E^1.5) regardless of hubs); each closed wedge (s, u, v)
    explodes to its three member nodes for the per-node count — the
    triple stream is triangle-sized, not wedge-sized.

    Returns (node, degree, n_triangles, lcc) for nodes with
    deg >= min_degree (lcc is undefined below 2).
    """
    a, b = F.col("_a"), F.col("_b")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_a"),
            F.greatest(F.col(src), F.col(dst)).alias("_b"),
        )
        .filter(a != b)
        .distinct()
        .persist()
    )
    deg = (
        und.select(a.alias("_n"))
        .unionAll(und.select(b.alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .persist()
    )
    da = deg.select(F.col("_n").alias("_a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("_n").alias("_b"), F.col("_deg").alias("_db"))
    oriented = (
        und.join(da, "_a")
        .join(db, "_b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (a < b)),
                F.struct(a.alias("s"), b.alias("t")),
            )
            .otherwise(F.struct(b.alias("s"), a.alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("_s"), F.col("e.t").alias("_t"))
        # persisted like triangle_stats': both wedge legs consume it
        # through DIFFERENT projections, which defeats exchange reuse —
        # unpersisted, the two degree joins replay per leg (guide §5)
        .persist()
    )
    w1 = oriented.select(F.col("_s"), F.col("_t").alias("_u"))
    w2 = oriented.select(F.col("_s"), F.col("_t").alias("_v"))
    wedges = w1.join(w2, "_s").filter(F.col("_u") < F.col("_v"))
    triangles = wedges.join(
        und.select(F.col("_a").alias("_u"), F.col("_b").alias("_v")),
        ["_u", "_v"],
        "left_semi",
    )
    members = triangles.select(F.explode(F.array("_s", "_u", "_v")).alias("_n"))
    per_node = members.groupBy("_n").agg(
        F.count(F.lit(1)).cast("long").alias("_t")
    )
    out = (
        deg.filter(F.col("_deg") >= min_degree)
        .join(per_node, "_n", "left")
        .select(
            F.col("_n").alias("node"),
            F.col("_deg").cast("long").alias("degree"),
            F.coalesce(F.col("_t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("_t"), F.lit(0)).cast("double")
                / (F.col("_deg").cast("double") * (F.col("_deg").cast("double") - 1.0)),
                6,
            ).alias("lcc"),
        )
    )
    from d2b_dataframework_spark.datapipe import cache

    return cache.track(out, und, deg, oriented)
