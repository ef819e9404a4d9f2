"""Round-8 regression tests: the r7 ADVICE fixes and the r7 verdict's
scale items.

Covers (ADVICE r7):
- moments_profile: the overflow assert must survive Catalyst column
  pruning — selecting ONLY skewness/kurtosis from an out-of-domain
  input must still raise (the guard rides every moment column, not
  just `mean`).
- GA4 DSv2 open-ended last page + malformed-date degrade live in
  tests/test_dsv2.py next to the other ga4_report tests.

Covers (VERDICT r7):
- the plan-audit `gwin` counter: an unpartitioned window over an
  uncapped frame is flagged; limit-then-rank and scalar-aggregate
  inputs are not.
- q_dsir_importance ranks through the distributed global_row_number —
  zero unbounded global windows in its plan, and the persisted
  intermediate is tracked for release.
- q_eb_late_rate / q_local_clustering rank windows see <= 20 rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

SF_DIR = "/root/testdata/sf0.001"


def _gwin(df):
    import tools.plan_audit as pa

    return pa.count_unbounded_global_windows(df)


def test_moments_guard_survives_column_pruning(spark):
    """ADVICE r7: selecting only the high moments must not prune the
    overflow assert away with the mean column — out-of-domain input
    raises regardless of the projection."""
    from d2b_dataframework_spark.operators.stats import moments_profile

    df = spark.createDataFrame(
        [("g", 4.0e7), ("g", 1.0)], "k string, v double"
    )  # w = 4e9 > 3.162e9: out of domain
    out = moments_profile(df, "v", ["k"]).select("skewness", "excess_kurtosis")
    with pytest.raises(Exception, match="(?i)moments_profile|overflow|out_of_range"):
        out.collect()


def test_moments_guard_noop_in_domain_under_pruning(spark):
    """The widened guard must stay a no-op on in-domain groups even
    when only a subset of moment columns is selected."""
    from d2b_dataframework_spark.operators.stats import moments_profile

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 10.0)], "k string, v double"
    )
    r = moments_profile(df, "v", ["k"]).select("variance", "skewness").collect()[0]
    assert r["variance"] is not None and r["variance"] > 0
    assert r["skewness"] is not None


def test_gwin_counter_flags_unbounded_global_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert _gwin(df) == 1


def test_gwin_counter_accepts_limit_then_rank(spark):
    df = (
        spark.range(100)
        .orderBy("id")
        .limit(10)
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    assert _gwin(df) == 0


def test_gwin_counter_accepts_scalar_aggregate_input(spark):
    df = spark.range(100).agg(F.sum("id").alias("s")).withColumn(
        "rn", F.row_number().over(Window.orderBy("s"))
    )
    assert _gwin(df) == 0


def test_gwin_counter_accepts_partitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    )
    assert _gwin(df) == 0


def test_dsir_importance_no_global_window_and_tracked_handle(spark):
    """VERDICT r7 #2: the full-corpus rank must come from
    global_row_number (range partition + offsets), leaving ZERO
    unpartitioned windows over uncapped frames in the plan; the
    persisted range intermediate must be release()-able from the
    returned frame."""
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    df = REGISTRY["dsir_importance"].spark(spark, SF_DIR)
    assert _gwin(df) == 0
    handles = getattr(df, "_d2b_persisted", ())
    assert handles, "range-partitioned intermediate must be tracked on the result"
    rows = df.collect()
    assert len(rows) > 0
    assert sum(1 for r in rows if r["selected"]) == min(50, len(rows))
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    cache.release(df)


def test_quantile_normalize_and_revenue_gini_track_handles(spark):
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    for name in ("quantile_normalize", "revenue_gini"):
        df = REGISTRY[name].spark(spark, SF_DIR)
        assert getattr(df, "_d2b_persisted", ()), name
        cache.release(df)


def test_semdedup_capped_actually_skips_a_cluster(spark):
    """VERDICT r7 #6: the registry query must EXERCISE the guard — at
    the gate SFs some clusters exceed the cap (their members keep NULL
    max_sim_smaller and pruned=False) while others stay under it and
    still prune, so both arms flow through the oracle comparison."""
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import _SEMDEDUP_CAP, REGISTRY

    df = REGISTRY["semdedup_capped"].spark(spark, SF_DIR)
    rows = df.collect()
    over = [r for r in rows if r["cluster_size"] > _SEMDEDUP_CAP]
    under = [r for r in rows if r["cluster_size"] <= _SEMDEDUP_CAP]
    assert over, "cap never triggered — guard not exercised"
    assert under, "cap skipped everything — prune arm not exercised"
    assert all(r["max_sim_smaller"] is None and not r["pruned"] for r in over)
    assert any(r["pruned"] for r in under), "dup twins must prune under the cap"
    cache.release(df)


def test_topk_queries_have_no_unbounded_global_window(spark):
    """VERDICT r7 #3/#4: the aggregate-frame top-k queries rank AFTER a
    limit, so their window input is provably capped."""
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    for name in ("eb_late_rate", "local_clustering", "decayed_leaderboard"):
        df = REGISTRY[name].spark(spark, SF_DIR)
        assert _gwin(df) == 0, name
        cache.release(df)


# ---------------------------------------------------------------------------
# Round-8 new operators
# ---------------------------------------------------------------------------


def test_overlap_chunks_closed_form(spark, tmp_path):
    """100-token doc at 64/48 → starts 0/48/96, sizes 64/52/4, overlaps
    0/16/4 (the final short chunk overlaps its predecessor's tail)."""
    import os

    from d2b_dataframework_spark.plans.queries import REGISTRY

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, text, "en", "src0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_chunks")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = REGISTRY["overlap_chunks"].spark(spark, sf).collect()
    got = [
        (r["start_tok"], r["end_tok"], r["n_chunk_tokens"], r["overlap_prev"])
        for r in rows
    ]
    assert got == [(0, 64, 64, 0), (48, 100, 52, 16), (96, 100, 4, 4)]
    assert [r["first_token"] for r in rows] == ["w0", "w48", "w96"]


def test_filter_funnel_is_monotone_chain(spark):
    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = REGISTRY["filter_funnel"].spark(spark, SF_DIR).collect()
    assert len(rows) == 6
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_in"] == prev["n_kept"], "stages must chain"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_in"]
        assert r["n_dropped"] == r["n_in"] - r["n_kept"]


def test_doremi_weights_normalize_and_tilt_hard_domains(spark):
    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = REGISTRY["doremi_mixture"].spark(spark, SF_DIR).collect()
    assert abs(sum(r["doremi_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["baseline_share"] for r in rows) - 1.0) < 1e-4
    hardest = max(rows, key=lambda r: r["excess_loss"])
    easiest = min(rows, key=lambda r: r["excess_loss"])
    if hardest["excess_loss"] > easiest["excess_loss"]:
        assert hardest["doremi_weight"] >= easiest["doremi_weight"]


def test_idf_jaccard_finds_planted_twins(spark):
    """Every doc's ' zzzz'-suffixed twin shares all but the tail
    shingles, so (i, i+10000) must surface with high weighted J."""
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    df = REGISTRY["idf_jaccard_pairs"].spark(spark, SF_DIR)
    rows = df.collect()
    twins = {(r["id_a"], r["id_b"]) for r in rows if r["id_b"] == r["id_a"] + 10000}
    assert len(twins) > 0
    assert all(r["weighted_jaccard"] <= 1.0 for r in rows)
    cache.release(df)


def test_minhash_est_error_tracks_binomial_model(spark):
    """The 16-slot estimator's mean |err| should sit near the binomial
    model sqrt(J(1-J)/16) <= 0.125 — a loose 3x bound catches a broken
    estimator without flaking on small samples."""
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    df = REGISTRY["minhash_est_error"].spark(spark, SF_DIR)
    rows = df.collect()
    assert rows, "LSH candidates must exist on the dup corpus"
    for r in rows:
        assert r["mean_abs_err"] <= 3 * 0.125, r
        assert abs(r["mean_est"] - r["mean_true"]) <= 0.25, r
    cache.release(df)


def test_lexical_hard_negatives_excludes_self_and_twin(spark):
    from d2b_dataframework_spark.plans.queries import REGISTRY

    rows = REGISTRY["lexical_hard_negatives"].spark(spark, SF_DIR).collect()
    assert rows, "cross-doc rare shingles must yield negatives"
    per_anchor: dict = {}
    for r in rows:
        assert r["negative"] != r["anchor"]
        assert r["negative"] != r["anchor"] + 10000, "twin is a positive"
        per_anchor.setdefault(r["anchor"], []).append(r["neg_rank"])
    for anchor, ranks in per_anchor.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), anchor
        assert len(ranks) <= 3
