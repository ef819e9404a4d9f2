"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Queries are materialized with the noop sink (full execution, no driver
collect, no disk write) so timings measure the computation, not I/O back
to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from d2b_dataframework_spark.core.session import get_session
    from d2b_dataframework_spark.plans.queries import REGISTRY

    # Optional subset (comma-separated names): used by tools/close_round.sh
    # follow-ups to pin late-landing queries without a full-registry run.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only_env:
        only = {n for n in only_env.split(",") if n}
        unknown = only - set(REGISTRY)
        if unknown:
            sys.exit(f"SPARK_GRAFT_BENCH_ONLY names not in registry: {sorted(unknown)}")
        REGISTRY = {n: s for n, s in REGISTRY.items() if n in only}

    spark = get_session("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the Python UDF workers (one per core) so the first
    # Arrow-batched query doesn't pay ~8s of interpreter spawns.
    from pyspark.sql import functions as F  # noqa: PLC0415

    _noop = F.pandas_udf(lambda s: s, "long")  # lambda form: hint-free scalar UDF
    spark.range(10_000, numPartitions=int(cpus)).select(
        _noop(F.col("id"))
    ).write.format("noop").mode("overwrite").save()
    # Warm-up pass: run every query once at the smallest SF. This
    # compiles each plan's whole-stage-codegen classes, loads the md5 /
    # regex / Arrow codec classes, and touches the target tables' parquet
    # footers — one-time JVM costs that would otherwise be billed to
    # whichever timed query hits them first (measured ~3s on the first
    # md5+regex pipeline alone). Timed runs below then measure
    # steady-state computation, which is the quantity that scales.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for spec in REGISTRY.values():
        try:
            spec.spark(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 - a tiny-SF quirk must not kill bench
            pass
    spark.catalog.clearCache()  # drop warm-pass persist()s
    for table in ("documents", "embeddings", "orders", "events", "lineitem"):
        try:
            spark.read.parquet(f"{sf_dir}/{table}.parquet").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001 - missing table at tiny SFs is fine
            pass

    # n>=3 interleaved rounds; report the per-query MEDIAN so round-over-
    # round comparisons aren't dominated by the ±10% single-run noise of
    # local[32] (each query's JSON value is its median; detail carries
    # median/min/n).
    from d2b_dataframework_spark.datapipe.cache import release

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in REGISTRY}
    for _ in range(n_runs):
        for name, spec in REGISTRY.items():
            start = time.perf_counter()
            out = spec.spark(spark, sf_dir)
            out.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - start
            samples[name].append(t)
            # the documented consumer contract: drop this query's tracked
            # persists so caches don't pile eviction pressure onto every
            # later query in the round (release is outside the timer —
            # it's bookkeeping the NEXT query shouldn't inherit either way)
            release(out)
            print(f"{name}: {round(t, 4)}s", file=sys.stderr, flush=True)
        spark.catalog.clearCache()  # drop untracked pair-builder persists

    from statistics import median

    timings = {name: round(median(ts), 4) for name, ts in samples.items()}
    detail = {
        name: {"median": round(median(ts), 4), "min": round(min(ts), 4), "n": len(ts)}
        for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 4)

    # Per-query detail is too large for the driver's 2000-byte stdout
    # capture (the r02 bench line was unparseable for exactly that
    # reason) — write it next to the repo as a committed artifact and
    # keep the final stdout line compact and guaranteed parseable.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_runs": n_runs,
                "queries": timings,
                "queries_detail": detail,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")

    # The headline "queries" map carries only the slowest queries so the
    # line stays well under the driver's capture limit; the full map is
    # in BENCH_DETAIL.json.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    line = json.dumps(
        {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            # registry size grows round over round — the per-query
            # mean is the comparable throughput number
            "n_queries": len(timings),
            "per_query_mean_sec": round(total / max(1, len(timings)), 4),
            "sf": sf,
            "detail_file": os.path.basename(detail_path),
        }
    )
    if len(line.encode()) > 1900:  # hard safety: never exceed driver capture
        line = json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": {},
                "n_queries": len(timings),
                "per_query_mean_sec": round(total / max(1, len(timings)), 4),
                "sf": sf,
            }
        )
    print(line)


if __name__ == "__main__":
    main()
