"""Round-over-round bench diff: flags per-query regressions.

Usage:
    python tools/bench_compare.py [OLD_DETAIL.json] [NEW_DETAIL.json] [ratio]

With no arguments, diffs the latest run (``BENCH_DETAIL.json``) against
the PINNED baseline (``BENCH_BASELINE.json`` — the round-3 per-query
medians committed as the reference point; re-pin deliberately, never
implicitly). Inputs are ``BENCH_DETAIL.json`` files (bench.py writes one
per run) or any JSON with a ``{"queries": {name: seconds}}`` map (old
driver BENCH_r*.json "parsed" payloads qualify). Prints added/removed
queries, the biggest movers in both directions, and exits non-zero when
any shared query regressed more than ``ratio`` (default 1.3x vs the
pinned baseline) AND by more than 0.3s absolute — the absolute floor
keeps sub-second jitter from failing the gate.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT_OLD = os.path.join(_REPO, "BENCH_BASELINE.json")
_DEFAULT_NEW = os.path.join(_REPO, "BENCH_DETAIL.json")


def _queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    q = doc.get("queries") or {}
    # detail files carry {"median": x} objects; flat files carry floats
    return {
        k: (v["median"] if isinstance(v, dict) else float(v)) for k, v in q.items()
    }


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] in ("-h", "--help"):
        sys.exit(__doc__)
    old_path = args[0] if len(args) > 0 else _DEFAULT_OLD
    new_path = args[1] if len(args) > 1 else _DEFAULT_NEW
    print(f"baseline: {os.path.basename(old_path)}  "
          f"candidate: {os.path.basename(new_path)}")
    old = _queries(old_path)
    new = _queries(new_path)
    ratio = float(args[2]) if len(args) > 2 else 1.3

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    movers = sorted(
        ((n, old[n], new[n], new[n] / max(old[n], 1e-9)) for n in shared),
        key=lambda t: t[3],
    )
    print(f"\n{'query':32s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for n, o, w, r in movers[:5] + [("...", 0, 0, 0)] + movers[-8:]:
        if n == "...":
            print("...")
            continue
        print(f"{n:32s} {o:8.3f} {w:8.3f} {r:7.2f}")

    tot_old = sum(old[n] for n in shared)
    tot_new = sum(new[n] for n in shared)
    print(
        f"\nshared {len(shared)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / max(tot_old, 1e-9):.2f}x)"
    )

    regressed = [
        (n, old[n], new[n])
        for n in shared
        if new[n] > old[n] * ratio and new[n] - old[n] > 0.3
    ]
    if regressed:
        print(f"\nREGRESSED (> {ratio}x and > 0.3s):")
        for n, o, w in sorted(regressed, key=lambda t: t[2] - t[1], reverse=True):
            print(f"  {n}: {o:.3f}s -> {w:.3f}s")
        sys.exit(1)
    print("no regressions beyond threshold")


if __name__ == "__main__":
    main()
