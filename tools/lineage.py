"""Table-level lineage: which source tables does each registered query
read? Extracted from the ANALYZED logical plan (not from code text), so
it is ground truth — a relation only appears if the optimizer will
actually scan it.

Usage: python tools/lineage.py [sf_dir] [--md LINEAGE.md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    md_path = None
    if "--md" in sys.argv:
        md_path = sys.argv[sys.argv.index("--md") + 1]

    from d2b_dataframework_spark.core.session import get_session
    from d2b_dataframework_spark.plans.queries import REGISTRY

    spark = get_session("lineage", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    pat = re.compile(r"(\w+)\.parquet")
    usage: dict[str, list[str]] = {}
    by_table: dict[str, list[str]] = {t: [] for t in TABLES}
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            tables = sorted({m for m in pat.findall(plan) if m in TABLES})
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            tables = [f"ERROR: {type(exc).__name__}"]
        usage[name] = tables
        for t in tables:
            by_table.setdefault(t, []).append(name)
        print(f"{name:28s} {', '.join(tables)}")
        spark.catalog.clearCache()

    if md_path:
        lines = ["# Table lineage (tools/lineage.py)", ""]
        lines.append(
            "Source tables per registered query, extracted from the executed "
            "physical plan — a table appears only if the plan scans it (checkpoint-truncated iterative plans may show none).\n"
        )
        lines.append("## By table")
        for t in TABLES:
            qs = by_table.get(t, [])
            lines.append(f"- **{t}** ({len(qs)} queries): {', '.join(qs)}")
        lines.append("\n## By query\n")
        lines.append("```")
        for name, tables in usage.items():
            lines.append(f"{name:28s} {', '.join(tables)}")
        lines.append("```")
        with open(md_path, "w") as f:
            f.write("\n".join(lines) + "\n")

    n_err = sum(1 for v in usage.values() if v and v[0].startswith("ERROR"))
    print(f"\n{len(usage)} queries, {n_err} errors")
    if n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
