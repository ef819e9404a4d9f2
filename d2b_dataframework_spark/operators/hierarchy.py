"""Hierarchy flattening: parent-child edges → root / depth / full path.

The DataFrame equivalent of ``WITH RECURSIVE`` (which Spark SQL lacks):
pointer-jumping on the ancestor column — each round joins the current
ancestor against the edge list and hops one level up, so a hierarchy of
depth d converges in d rounds (or O(log d) with path-halving, which the
per-round self-join on labels would provide; category/org hierarchies
are shallow, so the simple hop is the right constant factor).

Scale shape: the edge table is (child, parent) — two scalars per row;
every round is one equi-join + coalesce, shuffled on the ancestor key.
Rounds are bounded by ``max_iter``; each round localCheckpoints to stop
plan-lineage growth, and the convergence test is a one-scalar driver
job (count of rows whose ancestor still has a parent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_hierarchy(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_iter: int = 20,
    sep: str = "/",
) -> DataFrame:
    """``edges`` is (child, parent), one parent per child (a forest).
    Returns one row per node that appears as a child PLUS each root:
    ``node, root, depth, path`` where ``path`` runs root→node and roots
    have depth 0 and path = node."""
    e = edges.select(
        F.col(child).cast("string").alias("_c"), F.col(parent).cast("string").alias("_p")
    ).persist()
    labels = e.select(
        F.col("_c").alias("node"),
        F.col("_p").alias("anc"),
        F.lit(1).cast("long").alias("depth"),
        F.concat_ws(sep, "_p", "_c").alias("path"),
    ).localCheckpoint(eager=True)
    up = e.select(F.col("_c").alias("anc"), F.col("_p").alias("_gp"))
    for _ in range(max_iter):
        hopped = labels.join(up, "anc", "left")
        remaining = hopped.filter(F.col("_gp").isNotNull()).count()
        labels = hopped.select(
            "node",
            F.coalesce("_gp", "anc").alias("anc"),
            (F.col("depth") + F.when(F.col("_gp").isNotNull(), 1).otherwise(0)).alias(
                "depth"
            ),
            F.when(
                F.col("_gp").isNotNull(), F.concat_ws(sep, "_gp", "path")
            )
            .otherwise(F.col("path"))
            .alias("path"),
        ).localCheckpoint(eager=True)
        if remaining == 0:
            break
    roots = (
        e.select(F.col("_p").alias("node"))
        .distinct()
        .join(e.select(F.col("_c").alias("node")).distinct(), "node", "left_anti")
        .select(
            "node",
            F.col("node").alias("anc"),
            F.lit(0).cast("long").alias("depth"),
            F.col("node").alias("path"),
        )
    )
    out = labels.select("node", F.col("anc").alias("root"), "depth", "path").unionByName(
        roots.select("node", F.col("anc").alias("root"), "depth", "path")
    )
    e.unpersist()
    return out
