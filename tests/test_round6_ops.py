"""Round-6: gate-order drift guards (the holt_winters/knn_classifier
class of bug from round 5), ADVICE fixes (interval overlap length,
markov zero-conversion guard, t-closeness single-bucket guard, Shopify
DSv2 bounded fan-out), and new round-6 operators."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Gate-order structural guards
# ---------------------------------------------------------------------------


def _registry():
    from d2b_dataframework_spark.plans import queries as Q

    return Q


def test_gate_order_unverified_always_precede_verified():
    """The permanent fix for the round-5 drift: a registry name that has
    never appeared in a driver CORRECTNESS artifact must sort BEFORE
    every already-verified name, no matter which staging tuple it was
    (or wasn't) added to.  A new query can therefore never silently
    queue behind the verified block and skip the sampled window.

    One EXPLICIT exception: names staged in the CURRENT round's tuple
    (``_STAGING[-1]``) ride immediately behind the recheck slice so the
    window stays pure backlog+recheck — they must still precede the
    remaining verified block (checked below), so they lead the next
    round's backlog rather than sinking."""
    Q = _registry()
    order = Q._gate_order()
    assert sorted(order) == sorted(Q.REGISTRY), "gate order must be a permutation"
    staged_behind_recheck = set(Q._STAGING[-1])
    n_unverified = sum(
        1
        for n in Q.REGISTRY
        if n not in Q._DRIVER_VERIFIED and n not in staged_behind_recheck
    )
    max_recheck = Q._recheck_count(n_unverified)
    n_verified_seen = 0
    for name in order:
        if name in Q._DRIVER_VERIFIED:
            n_verified_seen += 1
        elif name in staged_behind_recheck:
            assert n_verified_seen <= max_recheck, (
                f"staged query {name!r} sank behind the recheck slice — "
                "it would not lead the next round's backlog"
            )
        else:
            assert n_verified_seen == 0, (
                f"unverified query {name!r} ordered after a verified one — "
                "it would miss the driver's sampled window"
            )


def test_gate_order_covers_every_driver_artifact():
    """_DRIVER_VERIFIED must be a superset of every CORRECTNESS_r*.json
    the driver has produced so far — if an artifact lands and the set is
    not updated, the same names burn sampled-window slots for nothing."""
    Q = _registry()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact_names: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            data = json.load(fh)
        artifact_names.update(k for k in data if isinstance(data[k], dict))
    missing = artifact_names - set(Q._DRIVER_VERIFIED) - {"__error__"}
    # Tolerate artifact keys for queries since renamed/removed.
    missing &= set(Q.REGISTRY)
    assert not missing, (
        f"driver-verified names absent from _DRIVER_VERIFIED: {sorted(missing)}"
    )


def test_gate_order_staged_names_exist():
    """Frontload/newest tuples must reference real registry entries —
    a typo would silently drop the guarantee they encode."""
    Q = _registry()
    for name in (
        Q._FRONTLOAD_R6 + Q._NEWEST_R6 + Q._NEWEST_R7 + Q._NEWEST_R8 + Q._NEWEST_R9
    ):
        assert name in Q.REGISTRY, name


def test_gate_window_is_all_first_time_names_this_round():
    """Standing contract: the sampled window leads with the
    never-driver-checked backlog (everything unverified except THIS
    round's staging tuple, ``_STAGING[-1]``) and the recheck rotation
    fills EVERY remaining slot; brand-new queries queue BEHIND the
    rechecks so the window stays pure backlog+recheck until the
    backlog drains."""
    Q = _registry()
    order = Q._gate_order()
    window = order[: Q._GATE_WINDOW]
    backlog = {
        n
        for n in Q.REGISTRY
        if n not in Q._DRIVER_VERIFIED and n not in Q._STAGING[-1]
    }
    if len(backlog) >= Q._GATE_WINDOW:
        assert all(n not in Q._DRIVER_VERIFIED for n in window)
    else:
        assert set(window[: len(backlog)]) == backlog
        assert all(n in Q._DRIVER_VERIFIED for n in window[len(backlog) :])


def test_gate_window_r10_shape():
    """The r10 window is exactly the seven round-9 first-timers
    followed by 43 distinct verified recheck names (r9 verdict ask #2)
    — until the round-10 staging tuple grows or a new driver artifact
    lands, after which the other guards re-derive the counts."""
    Q = _registry()
    order = Q._gate_order()
    window = order[: Q._GATE_WINDOW]
    first_timers = [n for n in window if n not in Q._DRIVER_VERIFIED]
    rechecks = [n for n in window if n in Q._DRIVER_VERIFIED]
    assert set(first_timers) >= set(Q._NEWEST_R9) - set(Q._DRIVER_VERIFIED)
    assert len(rechecks) == len(set(rechecks)), "recheck slice must not repeat"
    if not Q._STAGING[-1] and set(Q._NEWEST_R9).isdisjoint(Q._DRIVER_VERIFIED):
        assert first_timers == list(Q._NEWEST_R9)
        assert len(rechecks) == 43


def test_driver_verified_is_derived_from_committed_artifacts():
    """Round-10 structural fix (r9 verdict ask #1): ``_DRIVER_VERIFIED``
    is the import-time union of green rows across CORRECTNESS_r*.json,
    so committing the artifact IS the fold — the literal fallback must
    be a (strict, once r9's artifact landed) subset, never the source
    of extra names."""
    Q = _registry()
    assert Q._DRIVER_VERIFIED_FALLBACK <= Q._DRIVER_VERIFIED
    derived = Q._load_driver_verified()
    assert derived == Q._DRIVER_VERIFIED
    # The r9 artifact's ten first-timers prove derivation is live.
    for name in ("semdedup_capped", "filter_funnel", "cluster_purity_nmi"):
        assert name in Q._DRIVER_VERIFIED
        assert name not in Q._DRIVER_VERIFIED_FALLBACK


# ---------------------------------------------------------------------------
# bfs_hops lineage severing (verdict nit #1)
# ---------------------------------------------------------------------------


def test_bfs_hops_deep_walk_through_checkpoint(spark):
    """Path 1-2-...-8 from seed {1} at 7 hops crosses the
    checkpoint-every-3 boundary twice (hops 3 and 6).  The persist-only
    variant (checkpoint_every=0) cannot even run at this depth — its
    analyzed plan string OOMs the JVM heap during explainString — so
    equality vs the persist-only path is cross-checked at 4 hops and
    the 7-hop answer is asserted against the closed form."""
    from d2b_dataframework_spark.datapipe.graph import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    want = {i: i - 1 for i in range(1, 9)}
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(edges, seeds, max_hops=7).collect()
    }
    assert got == want
    want4 = {i: i - 1 for i in range(1, 6)}
    got_ckpt4 = {
        r["node"]: r["hop"]
        for r in bfs_hops(edges, seeds, max_hops=4).collect()
    }
    got_nockpt4 = {
        r["node"]: r["hop"]
        for r in bfs_hops(edges, seeds, max_hops=4, checkpoint_every=0).collect()
    }
    assert got_ckpt4 == got_nockpt4 == want4


def test_bfs_hops_checkpoint_bounds_plan_growth(spark):
    """The analyzed plan after a checkpoint must NOT embed every prior
    hop: at 6 hops the checkpointed variant's plan string stays an
    order of magnitude smaller than the persist-only variant's."""
    from d2b_dataframework_spark.datapipe.graph import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    ckpt = bfs_hops(edges, seeds, max_hops=6, checkpoint_every=3)
    flat = bfs_hops(edges, seeds, max_hops=6, checkpoint_every=0)
    n_ckpt = str(ckpt._jdf.queryExecution().analyzed()).count("Join")
    n_flat = str(flat._jdf.queryExecution().analyzed()).count("Join")
    assert n_ckpt * 4 <= n_flat, (n_ckpt, n_flat)


# ---------------------------------------------------------------------------
# ADVICE r5 fixes
# ---------------------------------------------------------------------------


def test_t_closeness_single_bucket_is_zero_not_null(spark):
    """m = 1 global sensitive bucket: every class trivially matches the
    global distribution, so EMD must be 0.0 — not NULL (Spark 0/0) or
    NaN (DuckDB 0/0)."""
    from d2b_dataframework_spark.operators.quality import t_closeness_report

    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("b", 7)], "qi string, band long"
    )
    r = t_closeness_report(df, ["qi"], "band", threshold=0.2).collect()[0]
    assert r["t"] == 0.0
    assert r["classes_above_threshold"] == 0
    assert r["exposed_rows"] == 0


def test_interval_overlap_pairs_length_column(spark):
    """overlap_length: days for date intervals, raw difference for
    numeric intervals (the docstring's promise, ADVICE r5)."""
    import datetime as dt

    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    d = dt.date
    dates = spark.createDataFrame(
        [
            ("k", 1, d(2025, 1, 1), d(2025, 1, 10)),
            ("k", 2, d(2025, 1, 7), d(2025, 1, 20)),
        ],
        "g string, iid long, s date, e date",
    )
    row = interval_overlap_pairs(dates, ["g"], "iid", "s", "e").collect()[0]
    assert row["overlap_start"] == d(2025, 1, 7)
    assert row["overlap_end"] == d(2025, 1, 10)
    assert row["overlap_length"] == 3

    nums = spark.createDataFrame(
        [("k", 1, 0.0, 10.0), ("k", 2, 4.0, 20.0)],
        "g string, iid long, s double, e double",
    )
    row = interval_overlap_pairs(nums, ["g"], "iid", "s", "e").collect()[0]
    assert row["overlap_length"] == 6.0


# ---------------------------------------------------------------------------
# Round-6 operators
# ---------------------------------------------------------------------------


def test_theil_sen_slope_hand_computed(spark):
    """Points (0,0),(1,1),(2,10): pairwise slopes {1, 5, 9} -> median 5.
    The outlier (2,10) would drag an OLS slope to 5 too, but adding a
    4th point shows robustness: (0,0),(1,1),(2,2),(3,100) has slopes
    {1,1,33,1,49.5,98} -> median 17 vs OLS ~31."""
    from d2b_dataframework_spark.operators.stats import theil_sen_slope

    df = spark.createDataFrame(
        [("k", 0, 0), ("k", 1, 1), ("k", 2, 10)], "g string, x long, y long"
    )
    r = theil_sen_slope(df, ["g"], "x", "y").collect()[0]
    assert (r["n_pairs"], r["sen_slope"]) == (3, 5.0)


def test_theil_sen_slope_flat_series_is_plus_zero(spark):
    """A flat series has every slope 0; the +0.0 normalizer must keep
    the median at +0.0, never -0.0."""
    import math

    from d2b_dataframework_spark.operators.stats import theil_sen_slope

    df = spark.createDataFrame(
        [("k", i, 7) for i in range(4)], "g string, x long, y long"
    )
    r = theil_sen_slope(df, ["g"], "x", "y").collect()[0]
    assert r["sen_slope"] == 0.0 and math.copysign(1.0, r["sen_slope"]) == 1.0


def test_bh_fdr_textbook_example(spark):
    """p = (.01, .02, .03, .5) at alpha=.1: thresholds (k/4)*.1 =
    (.025, .05, .075, .1); largest passing k is 3, so exactly the first
    three hypotheses are rejected."""
    from d2b_dataframework_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5)],
        "h string, p double",
    )
    rows = {r["h"]: r for r in bh_fdr(df, "p", alpha=0.1).collect()}
    assert [rows[h]["rejected"] for h in "abcd"] == [True, True, True, False]
    assert rows["a"]["n_tests"] == 4 and rows["c"]["rank"] == 3


def test_bh_fdr_gap_rejects_through_largest_passing_rank(spark):
    """BH rejects 1..k for the LARGEST passing k even when a smaller
    rank fails its own threshold: p = (.01, .06, .07) at alpha=.3 has
    thresholds (.1, .2, .3); rank 2 fails? no — .06 <= .2 passes and
    .07 <= .3 passes, so use p=(.01, .25, .07): sorted (.01,.07,.25),
    thresholds (.1,.2,.3) -> .25<=.3 passes at rank 3, so ALL are
    rejected including rank 2's .07 (which also passes) — and crucially
    a failing middle rank would still be rejected."""
    from d2b_dataframework_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.25), ("c", 0.07)], "h string, p double"
    )
    rows = {r["h"]: r for r in bh_fdr(df, "p", alpha=0.3).collect()}
    assert all(rows[h]["rejected"] for h in "abc")


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    from d2b_dataframework_spark.operators.quality import dp_noisy_counts

    df = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 3, "g string"
    )
    r1 = {r["g"]: r for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    r2 = {r["g"]: r for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    assert r1.keys() == r2.keys()
    for g in r1:
        assert r1[g]["noise"] == r2[g]["noise"]  # hash-seeded: replayable
        assert r1[g]["noisy_count"] == r2[g]["noisy_count"]
        assert r1[g]["noisy_count"] >= 0.0
        assert abs(r1[g]["noisy_count"] - r1[g]["true_count"] - r1[g]["noise"]) < 1e-5
    assert r1["x"]["true_count"] == 5 and r1["y"]["true_count"] == 3
    # different seeds draw different noise
    r3 = {r["g"]: r for r in dp_noisy_counts(df, ["g"], seed="other").collect()}
    assert any(r3[g]["noise"] != r1[g]["noise"] for g in r1)


def test_sentence_stats_hand_computed(spark):
    from d2b_dataframework_spark.datapipe.text import sentence_stats

    df = spark.createDataFrame(
        [(1, "Hi there. Bye! Ok?"), (2, ""), (3, "no terminal punctuation")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in sentence_stats(df).collect()}
    assert rows[1]["n_sentences"] == 3
    assert rows[1]["avg_sentence_chars"] == round((8 + 3 + 2) / 3, 6)
    assert rows[1]["max_sentence_chars"] == 8
    assert rows[2]["n_sentences"] == 0 and rows[2]["avg_sentence_chars"] == 0.0
    assert rows[3]["n_sentences"] == 1


def test_hapax_stats_hand_computed(spark):
    from d2b_dataframework_spark.datapipe.text import hapax_stats

    df = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "c", "en"), (3, "x y", "es")],
        "doc_id long, text string, lang string",
    )
    rows = {r["lang"]: r for r in hapax_stats(df).collect()}
    assert (rows["en"]["vocab_size"], rows["en"]["n_hapax"]) == (3, 2)
    assert rows["en"]["n_tokens"] == 4
    assert rows["en"]["hapax_share"] == round(2 / 3, 6)
    assert (rows["es"]["vocab_size"], rows["es"]["n_hapax"]) == (2, 2)


def test_coverage_curve_hand_computed(spark):
    """Corpus 'a a a b c': total mass 5; ranks a(3), b(1), c(1) with
    cums 3,4,5 -> k50=1 (3 >= 2.5), k90=3 (first cum >= 4.5 is rank 3),
    k99=3."""
    from d2b_dataframework_spark.datapipe.text import coverage_curve

    df = spark.createDataFrame([(1, "a a a b c")], "doc_id long, text string")
    r = coverage_curve(df).collect()[0]
    assert (r["vocab_size"], r["total_tokens"]) == (3, 5)
    assert (r["k_at_50"], r["k_at_90"], r["k_at_99"]) == (1, 3, 3)
    assert r["top_token"] == "a" and r["top_share"] == 0.6


def test_shingle_dup_mass_hand_computed(spark):
    """Two identical 3-token docs + one unique doc: 2 distinct grams,
    the shared one carries df=2 of 3 total incidences."""
    from d2b_dataframework_spark.datapipe.dedup import shingle_dup_mass

    df = spark.createDataFrame(
        [(1, "x y z", "en"), (2, "x y z", "en"), (3, "p q r", "en")],
        "doc_id long, text string, lang string",
    )
    r = shingle_dup_mass(df).collect()[0]
    assert (r["n_grams"], r["n_shared_grams"]) == (2, 1)
    assert (r["total_incidences"], r["shared_incidences"]) == (3, 2)
    assert r["dup_mass_share"] == round(2 / 3, 6)


def test_bloom_design_table_matches_closed_form(spark):
    import math

    from d2b_dataframework_spark.operators.bloom import bloom_design_table

    df = spark.createDataFrame([(i % 10,) for i in range(40)], "k long")
    rows = {r["bits_per_key"]: r for r in bloom_design_table(df, "k").collect()}
    assert set(rows) == {8, 12, 16, 20}
    for b, r in rows.items():
        assert r["n_keys"] == 10 and r["m_bits"] == b * 10
        k = max(1, round(b * math.log(2.0)))
        assert r["k_hashes"] == k
        want = (1.0 - math.exp(-k / b)) ** k
        assert abs(r["fpr"] - want) < 1e-6


def test_power_iteration_diag_matrix_converges(spark):
    """diag(2, 1): the top eigenvector is e1 with eigenvalue 2; from
    v0=(1,1) eight iterations shrink the e2 component by 2^-8."""
    from d2b_dataframework_spark.datapipe.similarity import (
        power_iteration_top_eigvec,
    )

    cells = spark.createDataFrame(
        [(1, 1, 2.0), (1, 2, 0.0), (2, 1, 0.0), (2, 2, 1.0)],
        "i long, j long, c double",
    )
    rows = {r["dim"]: r for r in power_iteration_top_eigvec(cells, iters=8).collect()}
    assert rows[1]["component"] > 0.999
    assert 0.0 <= rows[2]["component"] < 0.01
    assert abs(rows[1]["eigenvalue"] - 2.0) < 1e-3
    # hash-seeded determinism: a second run is bit-identical
    again = {
        r["dim"]: r for r in power_iteration_top_eigvec(cells, iters=8).collect()
    }
    assert all(
        (rows[d]["component"], rows[d]["eigenvalue"])
        == (again[d]["component"], again[d]["eigenvalue"])
        for d in rows
    )


def test_mutual_nearest_pairs_kills_hub_chain(spark):
    """A-X is mutual (1.0 best for both). B also prefers X (3.0) but X
    prefers A, so B stays unmatched — no many-to-one chain."""
    from d2b_dataframework_spark.operators.fuzzy import mutual_nearest_pairs

    scored = spark.createDataFrame(
        [("A", "X", 1.0), ("A", "Y", 2.0), ("B", "X", 3.0), ("B", "Y", 4.0)],
        "l string, r string, dist double",
    )
    rows = mutual_nearest_pairs(scored, "l", "r", "dist").collect()
    assert [(r["l"], r["r"]) for r in rows] == [("A", "X")]
    # similarity mode (bigger is better) inverts the choice
    rows = mutual_nearest_pairs(scored, "l", "r", "dist", ascending=False).collect()
    assert sorted((r["l"], r["r"]) for r in rows) == [("B", "Y")]


def test_moments_profile_hand_computed(spark):
    """Values 1..4: mean 2.5, population variance 1.25, skewness 0
    (symmetric; must be +0.0, not -0.0), excess kurtosis
    m4/m2^2 - 3 = 2.5625/1.5625 - 3 = -1.36."""
    import math

    from d2b_dataframework_spark.operators.stats import moments_profile

    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4)], "k string, v double"
    )
    r = moments_profile(df, "v", ["k"]).collect()[0]
    assert (r["n"], r["mean"], r["variance"]) == (4, 2.5, 1.25)
    assert r["skewness"] == 0.0
    assert math.copysign(1.0, r["skewness"]) == 1.0
    assert r["excess_kurtosis"] == -1.36


def test_moments_profile_constant_series_zero_guards(spark):
    from d2b_dataframework_spark.operators.stats import moments_profile

    df = spark.createDataFrame([("g", 5.0)] * 3, "k string, v double")
    r = moments_profile(df, "v", ["k"]).collect()[0]
    assert (r["mean"], r["variance"]) == (5.0, 0.0)
    assert (r["skewness"], r["excess_kurtosis"]) == (0.0, 0.0)


def test_lsh_band_stats_counts_buckets_not_pairs(spark):
    """Three identical docs + one distinct: every band has one 3-doc
    bucket (3 candidate pairs) and one singleton; the audit never forms
    a pair frame."""
    from d2b_dataframework_spark.datapipe import dedup as dd

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb cc dd"), (3, "aa bb cc dd"),
         (4, "zz yy xx ww")],
        "doc_id long, text string",
    )
    sigs = dd.minhash_signatures(docs)
    rows = dd.lsh_band_stats(sigs).collect()
    assert len(rows) == dd.N_BANDS
    for r in rows:
        assert r["n_docs"] == 4
        assert r["max_bucket"] == 3
        assert r["n_buckets"] == 2
        assert r["n_colliding_buckets"] == 1
        assert r["candidate_pairs"] == 3


def test_lsh_candidate_pairs_unchanged_by_bands_refactor(spark):
    """lsh_candidate_pairs must still find the identical-doc family
    after the shared lsh_bands extraction."""
    from d2b_dataframework_spark.datapipe import dedup as dd

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb cc dd"), (3, "zz yy xx ww")],
        "doc_id long, text string",
    )
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(docs)).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_semi_additive_last_value_per_month_summed(spark):
    """User 1 ends Jan at 30 (not 10+30), user 2 at 5; Feb only user 1
    with 7. Sum-across-users, last-within-month."""
    import datetime as dt

    from d2b_dataframework_spark.plans.queries import q_semi_additive_totals

    # build a tiny parquet dir shaped like the events table
    import tempfile

    rows = [
        (1, dt.datetime(2024, 1, 5, 10), 1, "view", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 20, 10), 1, "view", 30.0, "{}"),
        (3, dt.datetime(2024, 1, 7, 10), 2, "view", 5.0, "{}"),
        (4, dt.datetime(2024, 2, 2, 10), 1, "view", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            str(r["month"]): (r["n_users"], r["eom_balance_sum"])
            for r in q_semi_additive_totals(spark, d).collect()
        }
    assert got == {"2024-01-01": (2, 35.0), "2024-02-01": (1, 7.0)}


def test_window_funnel_enforces_deadline(spark):
    """User 1 converts inside 7 days; user 2 clicks on day 8 — outside
    the window, so the click (and its purchase) must NOT count."""
    import datetime as dt
    import tempfile

    from d2b_dataframework_spark.plans.queries import q_window_funnel

    t0 = dt.datetime(2024, 1, 1, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(days=2), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(days=3), 1, "purchase", 0.0, "{}"),
        (4, t0, 2, "view", 0.0, "{}"),
        (5, t0 + dt.timedelta(days=8), 2, "click", 0.0, "{}"),
        (6, t0 + dt.timedelta(days=9), 2, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        r = q_window_funnel(spark, d).collect()[0]
    assert (r["n_view"], r["n_click_7d"], r["n_purchase_7d"]) == (2, 1, 1)
    assert r["view_to_click"] == 0.5 and r["click_to_purchase"] == 1.0


def test_user_behavior_entropy_buckets(spark):
    """User 1: 4 uniform types -> H = 2 bits -> half-bit bucket 4.
    User 2: one type -> H = 0 -> bucket 0."""
    import datetime as dt
    import tempfile

    from d2b_dataframework_spark.plans.queries import q_user_behavior_entropy

    t = dt.datetime(2024, 1, 1)
    rows = [(i, t, 1, et, 0.0, "{}") for i, et in enumerate(["a", "b", "c", "d"])]
    rows += [(10 + i, t, 2, "a", 0.0, "{}") for i in range(3)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["entropy_halfbit"]: r["n_users"]
            for r in q_user_behavior_entropy(spark, d).collect()
        }
    assert got == {0: 1, 4: 1}


def test_temporal_split_leakage_orders_temporally(spark):
    """Users: u1 spans all three splits; u2 train-only. The overlap
    column must follow TEMPORAL order (train<val<test), not the
    lexicographic accident ('test'<'train'<'val')."""
    import datetime as dt
    import tempfile

    from d2b_dataframework_spark.plans.queries import q_temporal_split_leakage

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 10 events: 6 train (u1 x3, u2 x3), 2 val (u1), 2 test (u1)
    for i in range(3):
        rows.append((i, t0 + dt.timedelta(hours=i), 1, "view", 0.0, "{}"))
        rows.append((10 + i, t0 + dt.timedelta(hours=i), 2, "view", 0.0, "{}"))
    rows.append((20, t0 + dt.timedelta(days=1), 1, "view", 0.0, "{}"))
    rows.append((21, t0 + dt.timedelta(days=1, hours=1), 1, "view", 0.0, "{}"))
    rows.append((22, t0 + dt.timedelta(days=2), 1, "view", 0.0, "{}"))
    rows.append((23, t0 + dt.timedelta(days=2, hours=1), 1, "view", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["split"]: (
                r["n_rows"], r["n_users"], r["users_shared_with_later_split"]
            )
            for r in q_temporal_split_leakage(spark, d).collect()
        }
    assert got["train"][2] == 1  # u1 leaks forward; u2 does not
    assert got["val"][2] == 1    # u1 also appears in test
    assert got["test"][2] == 0   # nothing is later than test


def test_dbscan_census_partitions_points(spark):
    """core + border + noise must partition the point set, and every
    core point has >= min_pts neighbors in the pair frame."""
    from d2b_dataframework_spark.plans.queries import (
        q_dbscan_core_points,
        q_spatial_neighbors,
    )

    sf = "/root/testdata/sf0.001"
    r = q_dbscan_core_points(spark, sf).collect()[0]
    assert r["n_core"] + r["n_border"] + r["n_noise"] == r["n_points"]
    assert 0.0 <= r["core_fraction"] <= 1.0
    pairs = q_spatial_neighbors(spark, sf).select("id_a", "id_b")
    from pyspark.sql import functions as F2

    deg = (
        pairs.select(F2.col("id_a").alias("cid"))
        .unionAll(pairs.select(F2.col("id_b").alias("cid")))
        .groupBy("cid")
        .count()
    )
    n_core_direct = deg.filter(F2.col("count") >= 3).count()
    assert n_core_direct == r["n_core"]


def test_als_item_step_solves_normal_equations(spark):
    """For one item, the 2x2 closed form recomputed in Python from the
    SAME md5 factor init must match the engine's (v1, v2)."""
    import hashlib

    from d2b_dataframework_spark.plans.queries import q_als_item_step

    sf = "/root/testdata/sf0.001"
    rows = q_als_item_step(spark, sf).collect()
    assert rows, "expected at least one item with >= 8 raters"
    target = rows[0]["item_id"]

    from pyspark.sql import functions as F2

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F2.col("l_partkey") == target)
        .groupBy(F2.col("o_custkey").alias("user_id"))
        .agg(
            F2.sum(F2.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("r")
        )
        .collect()
    )

    def mdu(salt, uid):
        h = int(hashlib.md5(f"{salt}:{uid}".encode()).hexdigest()[:7], 16)
        return (h % 1000000) / 1000000.0 - 0.5

    s11 = s12 = s22 = s1y = s2y = 0
    for row in ratings:
        f1, f2 = mdu("alsg1", row["user_id"]), mdu("alsg2", row["user_id"])
        s11 += round(f1 * f1 * 1e9)
        s12 += round(f1 * f2 * 1e9)
        s22 += round(f2 * f2 * 1e9)
        s1y += round(f1 * row["r"] * 1e9)
        s2y += round(f2 * row["r"] * 1e9)
    a, d, b = s11 / 1e9 + 0.1, s22 / 1e9 + 0.1, s12 / 1e9
    det = a * d - b * b
    want_v1 = round((d * (s1y / 1e9) - b * (s2y / 1e9)) / det, 6)
    want_v2 = round((a * (s2y / 1e9) - b * (s1y / 1e9)) / det, 6)
    got = next(r for r in rows if r["item_id"] == target)
    assert (got["v1"], got["v2"]) == (want_v1, want_v2)
    assert got["n_users"] == len(ratings)


def test_mann_whitney_hand_computed(spark):
    """A = (1, 2), B = (3, 4): no ties, all B above all A -> R_A = 1+2,
    U_A = 3 - 2*3/2 = 0; mu = 2, sigma = sqrt(4*5/12) ~ 1.290994,
    z = -1.549193."""
    from d2b_dataframework_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)],
        "g string, v double",
    )
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["u_a"] == 0.0 and r["mu_u"] == 2.0
    assert r["sigma_u"] == round((4 * 5 / 12) ** 0.5, 6)
    assert r["z"] == round((0.0 - 2.0) / ((4 * 5 / 12) ** 0.5), 6)


def test_mann_whitney_ties_average_ranks(spark):
    """A = (1, 2), B = (2, 3): the tied 2s share rank 2.5 ->
    R_A = 1 + 2.5 = 3.5, U_A = 3.5 - 3 = 0.5; tie correction uses
    sum(t^3 - t) = 6."""
    from d2b_dataframework_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)],
        "g string, v double",
    )
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert r["u_a"] == 0.5
    import math

    want_sigma = math.sqrt(2 * 2 / 12 * ((4 + 1) - 6 / (4 * 3)))
    assert r["sigma_u"] == round(want_sigma, 6)


def test_stratified_kfold_exact_balance(spark):
    """10 docs in lang en, 7 in es, k=3: en folds sized (4,3,3), es
    (3,2,2) — every fold within ±1 of its stratum share."""
    from d2b_dataframework_spark.datapipe.splits import stratified_kfold

    rows = [(i, "x", "en") for i in range(10)] + [
        (100 + i, "x", "es") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_kfold(df, "lang", k=3)
    sizes = {
        (r["lang"], r["fold"]): r["n"]
        for r in out.groupBy("lang", "fold").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sorted(v for (lg, _), v in sizes.items() if lg == "en") == [3, 3, 4]
    assert sorted(v for (lg, _), v in sizes.items() if lg == "es") == [2, 2, 3]
    # deterministic: re-running deals identical folds
    again = stratified_kfold(df, "lang", k=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_huber_gd_replay(spark):
    """Replay the unrolled Huber steps in Python over a 4-point set and
    assert the engine's trajectory matches term-for-term (the
    logistic/quantile GD testing shape); the big residual (outlier at
    y=10) must hit the clip."""
    from d2b_dataframework_spark.datapipe.classify import huber_regression_gd

    pts = [(-1.0, -1.0), (0.0, 0.0), (1.0, 1.0), (0.5, 10.0)]  # (x, y)
    df = spark.createDataFrame(pts, "x1 double, y double")
    got = huber_regression_gd(df, ["x1"], "y", delta=1.0, iterations=3, lr=0.5).collect()[0]

    w = [0.0, 0.0]
    n = len(pts)
    for _ in range(3):
        g0 = g1 = 0
        for x, y in pts:
            r = y - (w[0] + w[1] * x)
            c = max(-1.0, min(1.0, r))
            g0 += round(c * 1e9)
            g1 += round(c * x * 1e9)
        w[0] += 0.5 * ((g0 / 1e9) / n)
        w[1] += 0.5 * ((g1 / 1e9) / n)
    assert (got["w0"], got["w1"]) == (round(w[0], 6), round(w[1], 6))
    hub = mae = 0
    for x, y in pts:
        r = y - (w[0] + w[1] * x)
        a = abs(r)
        hub += round((0.5 * r * r if a <= 1.0 else a - 0.5) * 1e9)
        mae += round(a * 1e9)
    assert got["huber_loss"] == round((hub / 1e9) / n, 6)
    assert got["mae"] == round((mae / 1e9) / n, 6)
    # the outlier's residual exceeded delta on every step -> bounded
    # influence: the slope stays far below the OLS slope (~3.2)
    assert got["w1"] < 2.0


def test_iqr_outlier_census_hand_computed(spark):
    """Values 1..8 plus 100 for one type: over 9 sorted points Q1/Q3
    land exactly on ranks 3 and 7 (values 3.0 and 7.0), IQR 4, fences
    -3.0 / 13.0; only 100 is outside."""
    import datetime as dt
    import tempfile

    from d2b_dataframework_spark.plans.queries import q_iqr_outlier_census

    t = dt.datetime(2024, 1, 1)
    rows = [(i, t, 1, "view", float(v), "{}") for i, v in enumerate(range(1, 9))]
    rows.append((9, t, 1, "view", 100.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        r = q_iqr_outlier_census(spark, d).collect()[0]
    assert (r["q1"], r["q3"]) == (3.0, 7.0)
    assert (r["lower_fence"], r["upper_fence"]) == (-3.0, 13.0)
    assert r["n_outliers"] == 1 and r["outlier_value_mass"] == 100.0


def test_feature_drift_ranking_ranks_worst_first(spark):
    """All three features present, PSI >= 0, ranks 1..3 follow psi desc
    (feature-name tiebreak)."""
    from d2b_dataframework_spark.plans.queries import q_feature_drift_ranking

    rows = q_feature_drift_ranking(spark, "/root/testdata/sf0.001").collect()
    assert [r["drift_rank"] for r in rows] == [1, 2, 3]
    assert {r["feature"] for r in rows} == {
        "quantity", "discount", "extendedprice"
    }
    psis = [r["psi"] for r in rows]
    assert all(p >= 0 for p in psis)
    assert psis == sorted(psis, reverse=True)


def test_brand_elasticity_slope_sign_on_synthetic(spark):
    """grouped_linreg over log features: on a clean Q = P^-2 synthetic
    relation the recovered slope is -2."""
    from d2b_dataframework_spark.operators.stats import grouped_linreg

    rows = []
    for p in (1.0, 2.0, 4.0, 8.0):
        import math

        rows.append(
            ("B", round(math.log(p), 4), round(math.log(p ** -2), 4))
        )
    df = spark.createDataFrame(rows, "b string, ln_price double, ln_qty double")
    r = grouped_linreg(df, ["b"], "ln_price", "ln_qty").collect()[0]
    assert abs(r["slope"] + 2.0) < 1e-3 and r["r2"] > 0.9999


def test_decayed_leaderboard_orders_by_decayed_mass(spark):
    """User 2's 10.0 from 7 days ago decays to ~4.97 < user 1's fresh
    5.0 — recency wins; exact scores match the closed form."""
    import datetime as dt
    import math
    import tempfile

    from d2b_dataframework_spark.plans.queries import q_decayed_leaderboard

    t0 = dt.datetime(2024, 1, 8)
    rows = [
        (1, t0, 1, "purchase", 5.0, "{}"),
        (2, t0 - dt.timedelta(days=7), 2, "purchase", 10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = q_decayed_leaderboard(spark, d).collect()
    assert [(r["rank"], r["user_id"]) for r in got] == [(1, 1), (2, 2)]
    assert got[0]["decayed_score"] == 5.0
    assert got[1]["decayed_score"] == round(round(10.0 * math.exp(-0.7), 9), 6)


def test_ucb_arm_selection_index_math(spark):
    """UCB1 index equals rate + sqrt(2 ln T / n) with T summed across
    arms; posterior is Beta(successes+1, failures+1)."""
    import math

    from d2b_dataframework_spark.plans.queries import q_ucb_arm_selection

    rows = q_ucb_arm_selection(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 4
    T = sum(r["trials"] for r in rows)
    for r in rows:
        if r["trials"] == 0:
            continue
        rate = r["successes"] / r["trials"]
        want = round(rate + math.sqrt(2 * math.log(T) / r["trials"]), 6)
        assert r["ucb1_index"] == want
        assert r["posterior_alpha"] == r["successes"] + 1
        assert r["posterior_beta"] == r["trials"] - r["successes"] + 1
