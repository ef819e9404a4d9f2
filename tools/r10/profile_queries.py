"""Round-10 profiling harness: split each query's wall time into
(plan-build + eager actions) vs (noop-sink execution), run N times,
and optionally dump .explain('formatted') to plans/r10/.

Usage:
    python tools/r10/profile_queries.py [query ...]   # default: top-40 by BENCH_DETAIL
Env:
    SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     (default 32)
    SPARK_GRAFT_PROFILE_RUNS (default 2)
    SPARK_GRAFT_PLANS_DIR    (write explain files when set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "")

    from d2b_dataframework_spark.core.session import get_session
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.plans.queries import REGISTRY

    names = sys.argv[1:]
    if not names:
        detail = json.load(open("BENCH_DETAIL.json"))["queries"]
        names = [n for n, _ in sorted(detail.items(), key=lambda kv: -kv[1])[:40]]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"not in registry: {unknown}")

    spark = get_session("profile_r10", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm: Python workers + codegen/md5/regex classes on the tiny SF.
    from pyspark.sql import functions as F  # noqa: PLC0415

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(10_000, numPartitions=int(cpus)).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for n in names:
        try:
            out = REGISTRY[n].spark(spark, warm_dir)
            out.write.format("noop").mode("overwrite").save()
            release(out)
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()

    rows = []
    for n in names:
        build_ts, exec_ts = [], []
        for r in range(n_runs):
            spark.sparkContext.setJobDescription(f"profile:{n}")
            t0 = time.perf_counter()
            out = REGISTRY[n].spark(spark, sf_dir)
            t1 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
            if plans_dir and r == 0:
                os.makedirs(plans_dir, exist_ok=True)
                with open(os.path.join(plans_dir, f"{n}.txt"), "w") as fh:
                    fh.write(out._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
            release(out)
        spark.catalog.clearCache()
        b, e = min(build_ts), min(exec_ts)
        rows.append((n, b, e))
        print(f"{n:35s} build={b:7.3f}s exec={e:7.3f}s total={b + e:7.3f}s", flush=True)

    rows.sort(key=lambda r: -(r[1] + r[2]))
    print("\n== sorted by total ==")
    for n, b, e in rows:
        print(f"{n:35s} build={b:7.3f}s exec={e:7.3f}s total={b + e:7.3f}s")


if __name__ == "__main__":
    main()
