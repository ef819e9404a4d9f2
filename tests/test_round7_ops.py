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
