"""Re-pin BENCH_BASELINE.json from N idle bench runs.

Usage: python tools/pin_baseline.py RUN_DETAIL.json [RUN_DETAIL.json ...]
       [--note "free text appended to pinned_from"]

Each input is a bench.py BENCH_DETAIL.json (per-query medians of that
run's reps). The pin takes the PER-QUERY MEDIAN across runs (no
single-run weather in either direction — the r7 protocol) and writes
the repo-root BENCH_BASELINE.json. Re-pin deliberately, never
implicitly: this script exists so the pin provenance is reproducible.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def main() -> None:
    args = sys.argv[1:]
    note = ""
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        del args[i : i + 2]
    # --merge: update/add only the queries present in the given runs,
    # keeping every other existing pin entry (for pinning a late-landing
    # query subset without re-benching the whole registry).
    merge = "--merge" in args
    if merge:
        args.remove("--merge")
    if not args:
        sys.exit("need at least one BENCH_DETAIL.json")
    runs = []
    for path in args:
        with open(path) as fh:
            runs.append(json.load(fh))
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        names &= set(r["queries"])
    dropped = {n for r in runs for n in r["queries"]} - names
    detail = {}
    for n in sorted(names):
        vals = sorted(r["queries"][n] for r in runs)
        detail[n] = {
            "median": round(statistics.median(vals), 4),
            "min": round(vals[0], 4),
            "n": len(vals),
        }
    queries = {n: d["median"] for n, d in detail.items()}
    total = round(sum(queries.values()), 3)
    totals = [round(sum(r["queries"][n] for n in names), 1) for r in runs]
    out = {
        "metric": "total_query_sec",
        "n_runs": len(runs),
        "pinned_from": (
            f"idle {len(runs)}-run per-query medians ({len(names)} queries); "
            f"run totals {'/'.join(str(t) for t in totals)} s"
            + (f"; dropped (not in all runs): {sorted(dropped)}" if dropped else "")
            + (f"; {note}" if note else "")
        ),
        "queries": queries,
        "queries_detail": detail,
        "sf": runs[0].get("sf", 0.1),
        "unit": "sec",
        "value": total,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "BENCH_BASELINE.json")
    if merge and os.path.exists(dest):
        with open(dest) as fh:
            prev = json.load(fh)
        merged_q = dict(prev.get("queries", {}))
        merged_d = dict(prev.get("queries_detail", {}))
        merged_q.update(queries)
        merged_d.update(detail)
        out["queries"] = merged_q
        out["queries_detail"] = merged_d
        out["value"] = round(sum(merged_q.values()), 3)
        out["pinned_from"] = (
            prev.get("pinned_from", "")
            + f" | merged {sorted(names)}: {out['pinned_from']}"
        )
        names = set(merged_q)
        total = out["value"]
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"pinned {len(names)} queries, total {total} s -> {dest}")
    if dropped:
        print(f"WARNING dropped: {sorted(dropped)}")


if __name__ == "__main__":
    main()
