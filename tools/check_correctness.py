"""Local stand-in for the driver's correctness gate.

Runs every registered Spark query and its DuckDB oracle on the same
parquet tables, normalizes both results (columns sorted by name, rows
sorted by all columns), and compares row-count, schema shape, and values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas DataFrame → (n_rows, sorted column names, canonical rows)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        canon = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon.append(None)
            elif isinstance(v, float):
                canon.append(repr(v))
            elif hasattr(v, "isoformat"):
                canon.append(v.isoformat())
            else:
                canon.append(str(v))
        rows.append(tuple(canon))
    rows.sort(key=lambda r: tuple((x is None, x or "") for x in r))
    return len(df), cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from d2b_dataframework_spark.core.session import get_session
    from d2b_dataframework_spark.plans.queries import REGISTRY

    spark = get_session("correctness-check")
    # The driver's harness builds its own session with Spark 4's default
    # ANSI mode ON; SPARK_GRAFT_ANSI=true reproduces that locally so
    # ANSI-sensitive expressions (element_at, strict casts) can't hide
    # behind the engine's ANSI-off default.
    if os.environ.get("SPARK_GRAFT_ANSI", "").lower() in ("1", "true"):
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("[ansi] spark.sql.ansi.enabled=true")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        plan = None
        try:
            plan = spec.spark(spark, sf_dir)
            sdf = plan.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        finally:
            if plan is not None:
                # unpersist tracked intermediates so 300+ queries in one
                # session don't accumulate cached frames (mirrors bench.py)
                from d2b_dataframework_spark.datapipe.cache import release

                release(plan)
            else:
                # builder raised partway through: any intermediate a
                # datapipe op already persisted has no handle to release,
                # so clear the whole CacheManager — an orphaned cached
                # frame would otherwise be silently substituted into
                # later queries' matching plan subtrees for the rest of
                # the 300+-query session (the r9 cache-pollution class)
                spark.catalog.clearCache()
        if spec.sql is None:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(spec.sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            continue
        sn, scols, srows = normalize(sdf)
        on, ocols, orows = normalize(odf)
        if scols != ocols:
            failures.append((name, f"schema: spark={scols} oracle={ocols}"))
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
        elif sn != on:
            failures.append((name, f"rows: spark={sn} oracle={on}"))
            print(f"FAIL  {name}: rowcount spark={sn} oracle={on}")
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"FAIL  {name}: values differ; first diffs: {str(diff)[:400]}")
        else:
            print(f"PASS  {name} ({sn} rows)")

    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
