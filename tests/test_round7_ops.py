"""Round-7 regression tests: the r6 ADVICE fixes and new r7 operators.

Covers (ADVICE r6):
- moments_profile: w² accumulation in DECIMAL(38,0) — values past
  ~3.1e7 at decimals=2 must NOT silently null skew/kurtosis; the
  out-of-domain magnitude (w⁴ > 10³⁸) must fail LOUDLY (assert_true).
- q_bh_fdr: a cell whose mean equals the global mean is a p=1 "no
  evidence" cell on both legs, never a 0/0 NULL-vs-inf engine skew.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def test_moments_profile_wide_values_stay_exact(spark):
    """Values well inside the documented domain (w = 2e9, 4 rows →
    Σw⁴ = 6.4e37 < 10³⁸): the four power sums stay exact and the high
    moments come back non-null."""
    from d2b_dataframework_spark.operators.stats import moments_profile

    vals = [2.0e7, 1.9e7, 1.8e7, -2.0e7]
    df = spark.createDataFrame([("g", float(v)) for v in vals], "k string, v double")
    r = moments_profile(df, "v", ["k"]).collect()[0]
    assert r["variance"] is not None and r["variance"] > 0
    assert r["skewness"] is not None
    assert r["excess_kurtosis"] is not None


def test_moments_profile_out_of_domain_fails_loudly(spark):
    """|value|·10^decimals past ~3.16e9 makes the per-row w⁴ product
    overflow DECIMAL(38,0): must raise, not silently drop the row's
    term from the sum."""
    from d2b_dataframework_spark.operators.stats import moments_profile

    df = spark.createDataFrame(
        [("g", 4.0e7), ("g", 1.0)], "k string, v double"
    )  # w = 4e9 > 3.162e9
    with pytest.raises(Exception, match="(?i)moments_profile|overflow|out_of_range"):
        moments_profile(df, "v", ["k"]).collect()


def test_moments_profile_sum_overflow_fails_loudly(spark):
    """Per-row products in domain but the GROUP SUM of w⁴ past 10³⁸
    (4 rows at w = 3.1e9 → Σw⁴ ≈ 3.7e38) nulls the decimal sum under
    non-ANSI: must raise, not return null kurtosis."""
    from d2b_dataframework_spark.operators.stats import moments_profile

    df = spark.createDataFrame([("g", 3.1e7)] * 4, "k string, v double")
    with pytest.raises(Exception, match="(?i)moments_profile|overflow|out_of_range"):
        moments_profile(df, "v", ["k"]).collect()


def test_bh_fdr_zero_deviation_cell_is_p1(spark, tmp_path):
    """One (segment, bucket) cell only → cell mean == global mean →
    squared deviation is exactly 0. The Chebyshev bound is then 0/0:
    Spark nulls, DuckDB yields inf/NULL depending on
    ieee_floating_point_ops. The guard maps it to p=1 on BOTH legs."""
    import duckdb

    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = [(i, "AUTO", 3, float(100 + (i % 7))) for i in range(20)]
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_nationkey int, c_acctbal double"
    )
    sf_dir = str(tmp_path / "sf_bhfdr")
    os.makedirs(sf_dir, exist_ok=True)
    cust.coalesce(1).write.parquet(f"{sf_dir}/customer.parquet")

    spec = REGISTRY["bh_fdr"]
    got = spec.spark(spark, sf_dir).collect()
    assert len(got) == 1
    assert got[0]["p_value"] == 1.0  # not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf_dir}/customer.parquet/*.parquet')"
    )
    oracle = con.execute(spec.sql).fetchall()
    assert len(oracle) == 1
    assert float(oracle[0][3]) == 1.0


def test_lsh_bucket_topk_zero_planes_equals_brute_force(spark):
    """n_planes=0 puts every vector in one bucket — the bucketed path
    must then reproduce the exact brute-force ranking bit-for-bit (the
    lossless end of the recall/cost dial), on both signature modes."""
    from d2b_dataframework_spark.datapipe import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    for quantized in (False, True):
        approx = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in sim.lsh_bucket_topk(
                emb, queries, k=5, n_planes=0, quantized=quantized
            ).collect()
        }
        assert approx == exact


def test_lsh_ann_recall_is_measured_not_hoped(spark):
    """The recall column must be a real measurement: within [0, 1],
    with n_overlap = 10*recall, over all 8 audited queries."""
    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = REGISTRY["lsh_ann_recall"].spark(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["recall_at_10"] <= 1.0
        assert r["n_overlap"] == round(r["recall_at_10"] * 10)


@pytest.mark.parametrize("name", ["psi_drift", "feature_drift_ranking"])
def test_drift_exact_vs_approx_edges_agree(spark, name):
    """The 100 TB swap (VERDICT r6 #5): approx_percentile frozen edges
    must reproduce the exact-percentile PSI within tolerance at sf0.01
    — edge placement shifts at most ~1/accuracy of rank, and PSI only
    reads the edges."""
    from d2b_dataframework_spark.plans.queries import (
        q_feature_drift_ranking,
        q_psi_drift,
    )

    fn = {"psi_drift": q_psi_drift, "feature_drift_ranking": q_feature_drift_ranking}[
        name
    ]
    sf = "/root/testdata/sf0.01"
    exact = fn(spark, sf).collect()
    approx = fn(spark, sf, approx_edges=True, accuracy=10000).collect()
    assert len(exact) == len(approx)
    if name == "psi_drift":
        assert abs(exact[0]["psi"] - approx[0]["psi"]) < 0.01
    else:
        e = {r["feature"]: r["psi"] for r in exact}
        a = {r["feature"]: r["psi"] for r in approx}
        assert set(e) == set(a)
        for f in e:
            assert abs(e[f] - a[f]) < 0.01, f
        # drift ranking itself must be stable under the swap
        assert [r["feature"] for r in exact] == [r["feature"] for r in approx]


def test_semdedup_prunes_planted_twin_keeps_original(spark):
    """Two tight families far apart + one isolated point: family
    members beyond the lowest id prune against it; the isolated point
    and each family's min-id member survive."""
    from d2b_dataframework_spark.datapipe import similarity as sim
    from d2b_dataframework_spark.datapipe.cache import release

    def vec(base, eps):
        return [base + eps] + [base] * 63

    rows = (
        [(i, vec(1.0, 0.001 * i)) for i in range(3)]        # family A
        + [(10 + i, vec(-1.0, 0.001 * i)) for i in range(3)]  # family B
        + [(99, [5.0, -5.0] * 32)]                            # isolated
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semdedup_prune(df, k=3, iters=2, threshold=0.999)
    got = {r["vec_id"]: r for r in out.collect()}
    release(out)
    assert not got[0]["pruned"] and not got[10]["pruned"] and not got[99]["pruned"]
    assert got[1]["pruned"] and got[2]["pruned"]
    assert got[11]["pruned"] and got[12]["pruned"]
    assert got[0]["max_sim_smaller"] is None or got[0]["max_sim_smaller"] < 0.999
    assert got[1]["max_sim_smaller"] >= 0.999


def test_semdedup_cluster_cap_skips_pairing_visibly(spark):
    """With max_cluster_size below a cluster's size, that cluster's
    docs are all KEPT and their cluster_size column reports why."""
    from d2b_dataframework_spark.datapipe import similarity as sim
    from d2b_dataframework_spark.datapipe.cache import release

    rows = [(i, [1.0 + 0.0001 * i] + [1.0] * 63) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semdedup_prune(df, k=1, iters=1, threshold=0.9, max_cluster_size=3)
    got = out.collect()
    release(out)
    assert all(not r["pruned"] for r in got)
    assert all(r["cluster_size"] == 6 for r in got)


def test_duplicate_spans_hand_positions(spark):
    """Doc 1: t0..t19. Doc 2: x y + t5..t14 + z. The one shared span is
    tokens t5..t14 (10 tokens = 8 word-3-grams) at start_a=5 (doc 1
    token position) and start_b=2 (doc 2). No other run reaches
    min_run=3."""
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import duplicate_spans

    t = [f"t{i}" for i in range(20)]
    d1 = " ".join(t)
    d2 = " ".join(["x", "y"] + t[5:15] + ["z"])
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    out = duplicate_spans(df, min_run=3, n=3, max_df=None)
    rows = out.collect()
    release(out)
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"]) == (5, 2)
    assert r["run_grams"] == 8 and r["span_tokens"] == 10


def test_duplicate_spans_df_cap_only_splits_never_invents(spark):
    """A gram shared by every doc (boilerplate) is capped out of the
    join at max_df=2; the surviving spans are exactly the sub-runs on
    each side of the capped gram — capping splits runs, never creates
    them."""
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import duplicate_spans

    # 3 docs all contain the boilerplate trigram "b b b" in the middle
    left = "l1 l2 l3 l4".split()
    right = "r1 r2 r3 r4".split()
    shared = left + ["b", "b", "b"] + right
    df = spark.createDataFrame(
        [(1, " ".join(shared)), (2, " ".join(shared)), (3, "b b b only")],
        "doc_id long, text string",
    )
    uncapped = duplicate_spans(df, min_run=2, n=3, max_df=None)
    got_un = {(r["id_a"], r["id_b"], r["start_a"], r["run_grams"]) for r in uncapped.collect()}
    release(uncapped)
    # docs 1,2 identical: one full-length run of 9 grams (11 tokens)
    assert (1, 2, 0, 9) in got_un
    capped = duplicate_spans(df, min_run=2, n=3, max_df=2)
    got = {(r["id_a"], r["id_b"], r["start_a"], r["run_grams"]) for r in capped.collect()}
    release(capped)
    # grams touching 'b b b' appear in doc 3 too (df=3 > 2)... only the
    # pure-boilerplate gram "b b b" occurs in all 3; grams overlapping
    # the boundary exist in docs 1 and 2 only (df=2, kept). So the
    # doc-1/doc-2 run splits around exactly that one capped gram.
    assert (1, 2, 0, 4) in got and (1, 2, 5, 4) in got
    assert all(not (a == 1 and b == 3) for a, b, *_ in got)


def test_dsir_importance_upweights_target_lookalikes(spark):
    """Docs made of target-exclusive tokens must outrank docs of
    source-exclusive tokens; mixed docs sit between."""
    from d2b_dataframework_spark.datapipe.splits import dsir_log_importance

    rows = (
        [(i, "aa bb cc dd " * 5, True) for i in range(4)]       # target slice
        + [(10 + i, "xx yy zz ww " * 5, False) for i in range(4)]  # source bulk
        + [(20, "aa bb cc dd aa bb", False)]   # target-lookalike in source
        + [(21, "xx yy zz ww xx yy", False)]   # source-typical
        + [(22, "aa bb xx yy", False)]          # mixed
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, _is_tgt boolean")
    got = {
        r["doc_id"]: r["log_importance"]
        for r in dsir_log_importance(df, "_is_tgt").collect()
    }
    assert got[20] > got[22] > got[21]


def test_padding_waste_hand_computed(spark, tmp_path):
    """3 docs of 10/30/40 tokens: buckets 32 (two docs, 40 real /64
    padded) and 64 (one doc, 40/64); naive pads everything to 64."""
    import os as _os

    from d2b_dataframework_spark.plans.queries import REGISTRY

    docs = spark.createDataFrame(
        [
            (1, " ".join(["t"] * 10), "en", "src0", 1),
            (2, " ".join(["t"] * 30), "en", "src0", 1),
            (3, " ".join(["t"] * 40), "en", "src0", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_pad")
    _os.makedirs(sf, exist_ok=True)
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = {r["bucket_len"]: r for r in REGISTRY["padding_waste"].spark(spark, sf).collect()}
    assert rows[32]["n_docs"] == 2 and rows[32]["total_tokens"] == 40
    assert rows[32]["padded_tokens"] == 64
    assert rows[32]["waste_ratio"] == round(1 - 40 / 64, 6)
    assert rows[32]["naive_waste_ratio"] == round(1 - 40 / 128, 6)
    assert rows[64]["n_docs"] == 1 and rows[64]["waste_ratio"] == round(1 - 40 / 64, 6)


def test_gopher_flags_hand_cases(spark):
    """Three crafted docs: a clean passing doc, a symbol-heavy doc
    (fails symbol_ratio), and a repeated-line doc (fails
    dup_line_fraction)."""
    from d2b_dataframework_spark.datapipe.text import gopher_quality_flags

    clean = ("the quick brown fox jumps over a lazy dog and that is fine " * 5).strip()
    symbolic = " ".join(["###"] * 60) + " the a of and"
    repeated = "\n".join(["the same line of and a that is here now ok"] * 10)
    df = spark.createDataFrame(
        [(1, clean), (2, symbolic), (3, repeated)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert got[1]["passes"]
    assert not got[2]["passes"] and got[2]["symbol_ratio"] > 0.1
    assert not got[3]["passes"] and got[3]["dup_line_fraction"] > 0.3


def test_contrastive_negatives_exclude_partners_and_are_min_id(spark, tmp_path):
    """Every triplet's negative shares the anchor's cluster, is never a
    near-dup partner of the anchor, and neg_rank orders by ascending
    negative id."""
    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = REGISTRY["contrastive_pairs"].spark(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r["negative"] != r["anchor"] and r["negative"] != r["positive"]
        by_anchor.setdefault((r["anchor"], r["positive"]), []).append(
            (r["neg_rank"], r["negative"])
        )
    for negs in by_anchor.values():
        negs.sort()
        ids = [n for _, n in negs]
        assert ids == sorted(ids)
        assert [rk for rk, _ in negs] == list(range(1, len(negs) + 1))


def test_multiprobe_recall_not_worse_than_single_bucket(spark):
    """2 extra margin-ordered probes must not lose recall on average vs
    the single-bucket path (candidate superset; pointwise ties allowed)."""
    from d2b_dataframework_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    single = {
        r["query_id"]: r["recall_at_10"]
        for r in REGISTRY["lsh_ann_recall"].spark(spark, sf).collect()
    }
    multi = {
        r["query_id"]: r["recall_at_10"]
        for r in REGISTRY["multiprobe_ann_recall"].spark(spark, sf).collect()
    }
    assert set(single) == set(multi)
    n = len(single)
    assert sum(multi.values()) / n >= sum(single.values()) / n


def test_dup_span_token_share_full_copy_is_near_one(spark):
    """In the near-dup corpus every even doc's copy shares the doc's
    whole text, so most docs should report dup_share close to 1; no
    share may exceed 1 (interval merge forbids double counting)."""
    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = REGISTRY["dup_span_token_share"].spark(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(0.0 <= r["dup_share"] <= 1.0 for r in rows)
    covered = [r for r in rows if r["n_tokens"] >= 10]
    assert covered and sum(r["dup_share"] >= 0.8 for r in covered) / len(covered) > 0.5


def test_duplicate_spans_release_frees_persisted_blocks(spark):
    """cache.release on the spans result must unpersist the ACTUAL
    persisted positional frame — including under a df cap, where the
    tracked handle must be the persisted base, not its capped
    derivation (which was never persisted)."""
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g")], "doc_id long, text string"
    )
    out = duplicate_spans(docs, min_run=2, n=3, max_df=5)
    out.collect()
    handles = getattr(out, "_d2b_persisted", [])
    assert handles and any(
        h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles
    )
    release(out)
    assert all(
        not (h.storageLevel.useMemory or h.storageLevel.useDisk) for h in handles
    )
