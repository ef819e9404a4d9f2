"""Interleaved A/B: current prefix_filter_pairs vs PPJoin+-style
candidate pruning (prefix-overlap count + positional/suffix upper
bounds) with the array_union elimination in verify.

Soundness of the pruning (I = |A∩B|, arrays sorted by the SHARED
global (df, token) order, prefix = first pl tokens = globally smallest
tokens of the doc):

- bound_pos: the smallest common token of A and B is a prefix-prefix
  match (any smaller common token would have to sit in a suffix, but
  suffix tokens are larger than every prefix token of that doc). All
  common tokens sit at positions >= (pa0, pb0) of that first match, so
  I <= min(sza - pa0, szb - pb0).
- bound_suf: common tokens that are NOT prefix-prefix matches are
  strictly larger than min(amax_a, amax_b) (the smaller prefix-max), so
  they all live in THAT doc's suffix: count <= its suffix size. Hence
  I <= s + (amax_a <= amax_b ? sza - pl_a : szb - pl_b).
- verify keeps a pair only when round(I/U, 6) >= t, which requires
  I >= (t - 5e-7) * (sza + szb) / (1 + t - 5e-7). Pruning pairs whose
  upper bound is below that alpha (with extra 1e-6 absolute slack)
  can only remove pairs verify would reject -> identical output.

Run AFTER the baseline bench (idle host): python tools/r11/ab_prefix_filter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import DataFrame, functions as F

from d2b_dataframework_spark.core.session import get_session
from d2b_dataframework_spark.datapipe import dedup as dd
from d2b_dataframework_spark.datapipe import cache
from d2b_dataframework_spark.datapipe.cache import release
from d2b_dataframework_spark.plans.queries import _dup_corpus


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def new_prefix_filter_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    toks = dd.shingle_hash_frame(df, text_col=text_col, id_col=id_col, n=n).select(
        F.col(id_col), F.col("token_hashes").alias("_ts")
    )
    toks = toks.persist()
    flat = toks.select(F.col(id_col), F.explode("_ts").alias("_t"))
    dfreq = flat.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    ordered = (
        flat.join(dfreq, "_t")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_df"), F.col("_t").alias("t")))
                ),
                lambda x: x["t"],
            ).alias("_ots"),
            F.count(F.lit(1)).cast("long").alias("_sz"),
        )
    )
    ordered = ordered.persist()
    p_len = (
        F.col("_sz")
        - F.ceil(F.lit(float(threshold)) * F.col("_sz").cast("double")).cast("long")
        + 1
    )
    pref = ordered.withColumn("_pl", p_len).select(
        F.col(id_col),
        F.col("_sz"),
        F.col("_pl"),
        F.element_at("_ots", F.col("_pl").cast("int")).alias("_pmax"),
        F.posexplode(F.slice("_ots", 1, F.col("_pl").cast("int"))).alias("_pos", "_t"),
    )
    a = pref.select(
        F.col(id_col).alias("id_a"),
        F.col("_sz").alias("_sza"),
        F.col("_pl").alias("_pla"),
        F.col("_pmax").alias("_pmaxa"),
        F.col("_pos").alias("_posa"),
        "_t",
    )
    b = pref.select(
        F.col(id_col).alias("id_b"),
        F.col("_sz").alias("_szb"),
        F.col("_pl").alias("_plb"),
        F.col("_pmax").alias("_pmaxb"),
        F.col("_pos").alias("_posb"),
        F.col("_t").alias("_tb"),
    )
    t_eps = float(threshold) - 5.1e-7
    matched = a.join(
        b,
        (a["_t"] == b["_tb"])
        & (F.col("id_a") < F.col("id_b"))
        & (F.col("_sza").cast("double") >= F.lit(t_eps) * F.col("_szb").cast("double"))
        & (F.col("_szb").cast("double") >= F.lit(t_eps) * F.col("_sza").cast("double")),
    )
    agg = matched.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("_s"),
        F.min("_posa").alias("_pa0"),
        F.min("_posb").alias("_pb0"),
        F.min("_sza").alias("_sza"),
        F.min("_szb").alias("_szb"),
        F.min("_pla").alias("_pla"),
        F.min("_plb").alias("_plb"),
        F.min("_pmaxa").alias("_pmaxa"),
        F.min("_pmaxb").alias("_pmaxb"),
    )
    sz_sum = (F.col("_sza") + F.col("_szb")).cast("double")
    alpha = F.lit(t_eps) * sz_sum / F.lit(1.0 + t_eps) - F.lit(1e-6)
    bound_pos = F.least(
        F.col("_sza") - F.col("_pa0"), F.col("_szb") - F.col("_pb0")
    ).cast("double")
    bound_suf = (
        F.col("_s")
        + F.when(
            F.col("_pmaxa") <= F.col("_pmaxb"), F.col("_sza") - F.col("_pla")
        ).otherwise(F.col("_szb") - F.col("_plb"))
    ).cast("double")
    cands = agg.filter(
        (bound_pos >= alpha) & (bound_suf >= alpha)
    ).select("id_a", "id_b", "_sza", "_szb")
    sa = ordered.select(F.col(id_col).alias("id_a"), F.col("_ots").alias("_oa"))
    sb = ordered.select(F.col(id_col).alias("id_b"), F.col("_ots").alias("_ob"))
    inter = F.size(F.array_intersect("_oa", "_ob")).cast("double")
    union = (F.col("_sza") + F.col("_szb")).cast("double") - inter
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= F.lit(float(threshold)))
    )
    return cache.track(verified, ordered, toks)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("ab_pfj", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # correctness first: identical rows at sf0.01 and sf0.1
    for sf in ("/root/testdata/sf0.01", sf_dir):
        corpus = _dup_corpus(spark, sf, mutate=True)
        old = dd.prefix_filter_pairs(corpus, threshold=0.7)
        new = new_prefix_filter_pairs(corpus, threshold=0.7)
        o = sorted(map(tuple, old.collect()))
        nw = sorted(map(tuple, new.collect()))
        assert o == nw, f"MISMATCH at {sf}: {len(o)} vs {len(nw)} rows"
        print(f"{sf}: identical ({len(o)} pairs)", flush=True)
        release(old)
        release(new)
        spark.catalog.clearCache()

    # candidate-volume evidence
    corpus = _dup_corpus(spark, sf_dir, mutate=True)

    # interleaved timing, 4 rounds
    for rnd in range(4):
        for label, fn in (("old", dd.prefix_filter_pairs), ("new", new_prefix_filter_pairs)):
            t0 = time.perf_counter()
            out = fn(corpus, threshold=0.7).orderBy("id_a", "id_b")
            # mirror the registry query's _carry behavior: handles already tracked
            noop(out)
            dt = time.perf_counter() - t0
            print(f"round {rnd} {label}: {dt:.3f}s", flush=True)
            release(out)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
