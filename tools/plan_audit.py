"""Automated physical-plan audit over the whole query registry.

For every registered query, inspects the executed plan for the
anti-patterns that kill 100TB runs and for the properties the scale
design promises:

* ``CartesianProduct`` — unbounded O(n*m); always a bug here.
* ``BatchEvalPython`` — row-at-a-time Python UDF; everything Python in
  this engine must be Arrow-batched (``ArrowEvalPython`` / mapInPandas).
* Exchange / BroadcastExchange / Window counts — shuffle budget per query.
* ``PushedFilters`` presence when the query filters a parquet scan.

Usage: python tools/plan_audit.py [sf_dir] [--md PLAN_AUDIT.md]
Exits non-zero if a FORBIDDEN node appears, so it can gate CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


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
        cache.release(df)
        counts = {
            "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
            "broadcasts": plan.count("BroadcastExchange"),
            "windows": plan.count("Window ["),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
        }
        hits = [f for f in FORBIDDEN if f in plan]
        if hits:
            bad.append((name, hits))
        rows.append((name, counts, hits))
        spark.catalog.clearCache()

    header = f"{'query':28s} {'shuffle':>7s} {'bcast':>5s} {'win':>4s} {'arrow':>5s}  flags"
    print(header)
    lines = [header]
    for name, c, hits in rows:
        line = (
            f"{name:28s} {c['exchanges']:7d} {c['broadcasts']:5d}"
            f" {c['windows']:4d} {c['arrow_python']:5d}  {','.join(hits) or '-'}"
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
                "allowed in plans).\n\n```\n" + "\n".join(lines) + "\n```\n"
            )

    if bad:
        print(f"\nFORBIDDEN nodes in {len(bad)} queries: {bad}", file=sys.stderr)
        sys.exit(1)
    print(f"\nOK: {len(rows)} queries, no forbidden plan nodes")


if __name__ == "__main__":
    main()
