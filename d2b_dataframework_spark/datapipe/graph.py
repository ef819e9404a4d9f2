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
    ``localCheckpoint``-ed (eager), severing the accumulated lineage.
    Without it each iteration's plan embeds every previous iteration —
    at 10+ iterations analysis/codegen time grows superlinearly and a
    lost executor would recompute the whole chain. Checkpointing keeps
    per-iteration cost flat (tools/scale_probe.py probes 10 iterations).
    Set 0/None to disable (e.g. for plan-inspection tests).
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
    teleport = (F.lit(1.0) - F.lit(float(damping))) / n

    ranks = nodes.select("node", F.round(F.lit(1.0) / n, 12).alias("rank"))
    for it in range(int(iterations)):
        if checkpoint_every and it > 0 and it % int(checkpoint_every) == 0:
            # sever lineage: ranks is a narrow (node, double) frame, so
            # the checkpoint materialization is cheap relative to the
            # quadratic plan growth it prevents
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
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            F.round(
                teleport + F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
    return track(ranks, nodes, ew, e)
