"""Automated physical-plan audit over the whole query registry.

For every registered query, inspects the executed plan for the
anti-patterns that kill 100TB runs and for the properties the scale
design promises:

* ``CartesianProduct`` — unbounded O(n*m); always a bug here.
* ``BatchEvalPython`` — row-at-a-time Python UDF; everything Python in
  this engine must be Arrow-batched (``ArrowEvalPython`` / mapInPandas).
* Exchange / BroadcastExchange / Window counts — shuffle budget per query.
* ``PushedFilters`` presence when the query filters a parquet scan.
* ``gwin`` — unpartitioned Window whose input is not PROVABLY bounded
  (no limit / aggregate-to-literal anywhere below it): Spark funnels
  the entire input through ONE partition for such a window ("WindowExec:
  No Partition Defined" warning) — invisible at sf0.1, a single-executor
  sort of the corpus at 100 TB.  Bounded-by-construction sites (vocab-,
  bin-, or k-sized frames a limit can't express) are allowlisted BY NAME
  with the reason, so new offenders fail the audit.

Usage: python tools/plan_audit.py [sf_dir] [--md PLAN_AUDIT.md]
Exits non-zero if a FORBIDDEN node appears or an un-allowlisted
unbounded global window does, so it can gate CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

# Queries whose unpartitioned windows run over frames bounded by
# construction rather than by a plan-visible limit: the window input is
# a grouped aggregate over a domain whose cardinality is fixed (vocab
# buckets, histogram bins, model features, k centroids, bands) — a cap
# the logical plan cannot prove but the operator contract does.  Value =
# max tolerated unbounded-global-window count, keyed so an UNEXPECTED
# extra window in an allowlisted query still fails the audit.
GWIN_ALLOWLIST: dict[str, int] = {
    # Cumulative sum over the per-day aggregate: bounded by the
    # CALENDAR (a few thousand rows at any corpus scale); annotated at
    # the call sites (plans/queries.py q_concurrent_orders/q_rolling_kpis).
    "concurrent_orders": 1,
    "rolling_kpis": 1,
    # Rank over the per-feature PSI frame: exactly 3 rows (the feature
    # list is a literal stack).
    "feature_drift_ranking": 1,
    # Rank over the candidate-threshold frame: |_STUMP_GRID| literal
    # thresholds (datapipe/classify.py decision_stump).
    "gini_order_stump": 1,
    # Rank-sum windows over the DISTINCT quantized-value frame
    # (operators/stats.py mann_whitney_u: values rounded to `decimals`,
    # so the frame is bounded by the value domain, never raw rows).
    "mann_whitney": 1,
    # Cumulative counts over the 1000-bin mergeable histogram
    # (operators/sketches.py histogram_quantiles).
    "quantile_sketch": 3,
    # KS cumulative-CDF window over the groupBy(bin) frame: bin is
    # least(999, floor(...)) so the domain is ≤ 1000 rows at any corpus
    # scale.  Flagged only since the join-aware bound fix (the scalar
    # `tot` crossJoin no longer masks the unbounded-looking side).
    "ks_drift": 1,
    # BH rank + running-max windows over the (mktsegment × nation%5)
    # cell grid: ≤ 25 rows by domain construction (operators/stats.py
    # bh_fdr consumes the grouped-cell frame, never raw customers).
    "bh_fdr": 2,
}


def _iter_logical(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_logical(children.apply(i))


def _subtree_bounded(node) -> bool:
    """True if the subtree provably caps its row count: a limit node or
    an ungrouped (scalar) aggregate bounds everything above it — but
    only along UNARY ancestors.  A multi-child node (join, union) is
    bounded only if EVERY child is: a limit/scalar-aggregate under one
    side of a join does not bound the join's output (e.g. a global
    window over big_frame.crossJoin(broadcast(scalar_agg)) is still a
    full single-partition corpus sort — the r8 ADVICE finding)."""
    cls = node.getClass().getSimpleName()
    if cls in ("GlobalLimit", "LocalLimit"):
        return True
    if cls == "Aggregate" and node.groupingExpressions().isEmpty():
        return True
    children = node.children()
    n = children.size()
    if n == 0:
        return False
    return all(_subtree_bounded(children.apply(i)) for i in range(n))


def count_unbounded_global_windows(df) -> int:
    """Unpartitioned logical Window nodes whose input subtree has no
    plan-visible row cap — each one is a single-partition sort of its
    full input at execution time."""
    plan = df._jdf.queryExecution().optimizedPlan()
    n = 0
    for node in _iter_logical(plan):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not _subtree_bounded(node.child())
        ):
            n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    md_path = None
    if "--md" in sys.argv:
        md_path = sys.argv[sys.argv.index("--md") + 1]

    from d2b_dataframework_spark.core.session import get_session
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    spark = get_session("plan_audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    bad = []
    for name, spec in sorted(REGISTRY.items()):
        df = spec.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        gwin = count_unbounded_global_windows(df)
        cache.release(df)
        counts = {
            "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
            "broadcasts": plan.count("BroadcastExchange"),
            "windows": plan.count("Window ["),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "gwin": gwin,
        }
        hits = [f for f in FORBIDDEN if f in plan]
        if gwin > GWIN_ALLOWLIST.get(name, 0):
            hits.append(f"GWIN:{gwin}")
        if hits:
            bad.append((name, hits))
        rows.append((name, counts, hits))
        spark.catalog.clearCache()

    header = (
        f"{'query':28s} {'shuffle':>7s} {'bcast':>5s} {'win':>4s}"
        f" {'gwin':>4s} {'arrow':>5s}  flags"
    )
    print(header)
    lines = [header]
    for name, c, hits in rows:
        line = (
            f"{name:28s} {c['exchanges']:7d} {c['broadcasts']:5d}"
            f" {c['windows']:4d} {c['gwin']:4d} {c['arrow_python']:5d}"
            f"  {','.join(hits) or '-'}"
        )
        print(line)
        lines.append(line)

    if md_path:
        with open(md_path, "w") as fh:
            fh.write(
                "# Physical-plan audit (tools/plan_audit.py)\n\n"
                f"Registry: {len(rows)} queries at `{sf_dir}`. Forbidden nodes: "
                f"{', '.join(FORBIDDEN)} — zero tolerated.\n\n"
                "`shuffle` counts non-broadcast Exchanges (the shuffle budget); "
                "`arrow` counts Arrow-batched Python stages (the ONLY Python "
                "allowed in plans); `gwin` counts unpartitioned windows whose "
                "input has no plan-visible row cap (single-partition sort of "
                "the full input — zero tolerated outside the named "
                "allowlist).\n\n```\n" + "\n".join(lines) + "\n```\n"
            )

    if bad:
        print(f"\nFORBIDDEN nodes in {len(bad)} queries: {bad}", file=sys.stderr)
        sys.exit(1)
    print(
        f"\nOK: {len(rows)} queries, no forbidden plan nodes, no unbounded "
        "global windows outside the allowlist"
    )


if __name__ == "__main__":
    main()
