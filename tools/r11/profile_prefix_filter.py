"""Stage-level profile of prefix_filter_jaccard at the bench SF.

Splits the query into its pipeline stages and times each in
isolation (noop sink, persisted upstreams materialized first), so the
negative core-scaling seen in the r10 driver bench (12.3 s @32 cpus vs
5.8 s @8 cpus) can be attributed to a stage.

Usage: SPARK_GRAFT_CPUS=32 python tools/r11/profile_prefix_filter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F

from d2b_dataframework_spark.core.session import get_session
from d2b_dataframework_spark.datapipe import dedup as dd
from d2b_dataframework_spark.datapipe.cache import release
from d2b_dataframework_spark.plans.queries import REGISTRY, _dup_corpus


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("profile_pfj", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm: run the full query once at sf0.001 (codegen/md5/Arrow init)
    warm = REGISTRY["prefix_filter_jaccard"]
    noop(warm.spark(spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    # Full-query timing, 3 runs
    for i in range(3):
        t0 = time.perf_counter()
        out = warm.spark(spark, sf_dir)
        noop(out)
        print(f"full run {i}: {time.perf_counter() - t0:.3f}s", flush=True)
        release(out)
        spark.catalog.clearCache()

    # Stage split (mirrors prefix_filter_pairs internals)
    corpus = _dup_corpus(spark, sf_dir, mutate=True)
    t0 = time.perf_counter()
    toks = dd.shingle_hash_frame(corpus).select(
        F.col("doc_id"), F.col("token_hashes").alias("_ts")
    )
    toks = toks.persist()
    noop(toks)
    print(f"stage toks (arrow shingle+persist): {time.perf_counter() - t0:.3f}s", flush=True)

    t0 = time.perf_counter()
    flat = toks.select("doc_id", F.explode("_ts").alias("_t"))
    dfreq = flat.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    ordered = (
        flat.join(dfreq, "_t")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_df"), F.col("_t").alias("t")))
                ),
                lambda x: x["t"],
            ).alias("_ots"),
            F.count(F.lit(1)).cast("long").alias("_sz"),
        )
    ).persist()
    noop(ordered)
    print(f"stage ordered (df join+regroup+persist): {time.perf_counter() - t0:.3f}s", flush=True)

    threshold = 0.7
    p_len = (
        F.col("_sz")
        - F.ceil(F.lit(threshold) * F.col("_sz").cast("double")).cast("long")
        + 1
    )
    pref = ordered.select(
        F.col("doc_id"), F.col("_sz"), F.explode(F.slice("_ots", 1, p_len.cast("int"))).alias("_t")
    )
    a = pref.select(F.col("doc_id").alias("id_a"), F.col("_sz").alias("_sza"), "_t")
    b = pref.select(F.col("doc_id").alias("id_b"), F.col("_sz").alias("_szb"), "_t")
    t_eps = threshold - 5.1e-7
    t0 = time.perf_counter()
    cands = (
        a.join(
            b,
            (a["_t"] == b["_t"])
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("_sza").cast("double") >= F.lit(t_eps) * F.col("_szb").cast("double"))
            & (F.col("_szb").cast("double") >= F.lit(t_eps) * F.col("_sza").cast("double")),
        )
        .select("id_a", "id_b")
        .distinct()
    ).persist()
    noop(cands)
    print(f"stage cands (prefix equi-join+distinct): {time.perf_counter() - t0:.3f}s", flush=True)

    sa = ordered.select(F.col("doc_id").alias("id_a"), F.col("_ots").alias("_oa"))
    sb = ordered.select(F.col("doc_id").alias("id_b"), F.col("_ots").alias("_ob"))
    t0 = time.perf_counter()
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("_oa", "_ob")).cast("double")
                / F.size(F.array_union("_oa", "_ob")).cast("double"),
                6,
            ).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
    )
    noop(verified.orderBy("id_a", "id_b"))
    print(f"stage verify (intersect/union + sort): {time.perf_counter() - t0:.3f}s", flush=True)

    # sizes for context
    print("n cands:", cands.count(), flush=True)
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
