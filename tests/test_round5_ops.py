"""Round-5 operators: privacy trio completion (t-closeness), CUSUM
changepoints, interval-overlap joins, LSH parameter planning, Croston
intermittent demand, engine-exact gradient learners (logistic +
quantile regression), Markov removal-effect and exact-integer Shapley
attribution, and the ALS user half-step."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_t_closeness_hand_computed(spark):
    """Two classes over two ordered buckets: global q = (0.5, 0.5);
    class A = (1, 0) -> EMD = |0.5| / 1 = 0.5; class B mirrors. t=0.5,
    both classes above threshold 0.2."""
    from d2b_dataframework_spark.operators.quality import t_closeness_report

    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 1), ("b", 1)], "qi string, band long"
    )
    r = t_closeness_report(df, ["qi"], "band", threshold=0.2).collect()[0]
    assert r["t"] == 0.5
    assert r["n_classes"] == 2
    assert r["classes_above_threshold"] == 2
    assert r["exposed_rows"] == 4
    assert r["exposed_fraction"] == 1.0


def test_t_closeness_identical_distributions_zero(spark):
    from d2b_dataframework_spark.operators.quality import t_closeness_report

    rows = [(q, b) for q in ("a", "b") for b in (0, 1, 2)]
    df = spark.createDataFrame(rows, "qi string, band long")
    r = t_closeness_report(df, ["qi"], "band").collect()[0]
    assert r["t"] == 0.0 and r["classes_above_threshold"] == 0


def test_cusum_changepoint_obvious_shift(spark):
    """Series 0,0,0,10,10,10: the split after k=3 maximizes
    |S_k - (k/n)S_n| = |0 - 15| = 15; means 0 before, 10 after."""
    from d2b_dataframework_spark.operators.timeseries import cusum_changepoint

    rows = [("a", i, 0.0 if i < 3 else 10.0) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    r = cusum_changepoint(df, ["k"], "i", "v").collect()[0]
    assert r["n_points"] == 6
    assert r["change_at"] == 2  # last index of the low regime (k=3 rows)
    assert r["cusum_stat"] == 15.0
    assert (r["mean_before"], r["mean_after"]) == (0.0, 10.0)


def test_cusum_changepoint_all_equal_ties_earliest(spark):
    """A flat series has stat 0 everywhere — the tie must break to the
    EARLIEST interior split, never the end (k=n is excluded)."""
    from d2b_dataframework_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(4)], "k string, i long, v double"
    )
    r = cusum_changepoint(df, ["k"], "i", "v").collect()[0]
    assert r["change_at"] == 0 and r["cusum_stat"] == 0.0


def test_interval_overlap_pairs_basic(spark):
    """[0,5] x [3,8] overlap at [3,5]; [0,5] x [6,9] do not (closed
    intervals touch only when end == start)."""
    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    df = spark.createDataFrame(
        [("k", 1, 0, 5), ("k", 2, 3, 8), ("k", 3, 6, 9)],
        "g string, id long, s long, e long",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["overlap_start"], r["overlap_end"])
        for r in interval_overlap_pairs(df, ["g"], "id", "s", "e").collect()
    }
    assert got == {(1, 2): (3, 5), (2, 3): (6, 8)}


def test_interval_overlap_touching_endpoints_collide(spark):
    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    df = spark.createDataFrame(
        [("k", 1, 0, 5), ("k", 2, 5, 9)], "g string, id long, s long, e long"
    )
    rows = interval_overlap_pairs(df, ["g"], "id", "s", "e").collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["overlap_start"] == 5


def test_interval_overlap_keys_isolate(spark):
    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    df = spark.createDataFrame(
        [("k1", 1, 0, 9), ("k2", 2, 0, 9)], "g string, id long, s long, e long"
    )
    assert interval_overlap_pairs(df, ["g"], "id", "s", "e").collect() == []


def test_interval_overlap_max_group_size_drops_hot_key(spark):
    from d2b_dataframework_spark.operators.intervals import interval_overlap_pairs

    rows = [("hot", i, 0, 100) for i in range(5)] + [
        ("cold", 10, 0, 5),
        ("cold", 11, 3, 8),
    ]
    df = spark.createDataFrame(rows, "g string, id long, s long, e long")
    got = interval_overlap_pairs(
        df, ["g"], "id", "s", "e", max_group_size=3
    ).collect()
    assert [(r["g"], r["id_a"], r["id_b"]) for r in got] == [("cold", 10, 11)]


def test_lsh_design_table_closed_form(spark):
    """Every row must equal the closed form; the (16,1) banding's 50%
    point is 1/16 and the (1,16) banding's is 1."""
    from d2b_dataframework_spark.datapipe.dedup import lsh_design_table

    rows = lsh_design_table(spark).collect()
    assert len(rows) == 5 * 8  # divisors of 16 x s grid
    for r in rows:
        b, rr, s = r["bands"], r["rows_per_band"], r["s"]
        assert b * rr == 16
        assert r["p_candidate"] == round(1.0 - (1.0 - s**rr) ** b, 6)
        assert r["threshold_est"] == round((1.0 / b) ** (1.0 / rr), 6)
    t = {(r["bands"], r["rows_per_band"]): r["threshold_est"] for r in rows}
    assert t[(16, 1)] == round(1.0 / 16, 6)
    assert t[(1, 16)] == 1.0


def test_croston_hand_computed(spark):
    """Series 0,2,0,0,3: first demand at q=2 seeds z=2, p=2; next demand
    after q=3 zeros-gap -> z=0.3*3+0.7*2=2.3, p=0.3*3+0.7*2=2.3."""
    from d2b_dataframework_spark.operators.recurrence import croston_forecast

    rows = [(7, i, v) for i, v in enumerate([0.0, 2.0, 0.0, 0.0, 3.0])]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    r = croston_forecast(df, "k", ["i"], "v", alpha=0.3).collect()[0]
    assert (r["n_periods"], r["n_demand_periods"]) == (5, 2)
    assert r["z"] == 0.3 * 3.0 + 0.7 * 2.0
    assert r["p"] == 0.3 * 3.0 + 0.7 * 2.0
    assert r["forecast"] == r["z"] / r["p"]


def test_croston_all_zero_demand(spark):
    from d2b_dataframework_spark.operators.recurrence import croston_forecast

    df = spark.createDataFrame(
        [(1, i, 0.0) for i in range(4)], "k long, i long, v double"
    )
    r = croston_forecast(df, "k", ["i"], "v").collect()[0]
    assert (r["z"], r["p"], r["forecast"]) == (None, None, 0.0)


def test_logistic_gd_matches_numpy_replay(spark):
    """3 GD steps on a tiny separable set == a NumPy replay of the same
    rounded-gradient updates (the engine rounds per-row terms at 9; the
    replay does too)."""
    import numpy as np

    from d2b_dataframework_spark.datapipe.classify import logistic_gd

    xs = [(-2.0, 0.0), (-1.0, 0.0), (1.0, 1.0), (2.0, 1.0), (0.5, 1.0), (-0.5, 0.0)]
    df = spark.createDataFrame(xs, "x1 double, y double")
    r = logistic_gd(df, ["x1"], "y", iterations=3, lr=1.0).collect()[0]

    def scale9(v):
        # the engine's half-away-from-zero scaled-long rounding
        return np.where(v >= 0, np.floor(v * 1.0e9 + 0.5),
                        -np.floor(-v * 1.0e9 + 0.5))

    x = np.array([v[0] for v in xs])
    y = np.array([v[1] for v in xs])
    w = np.zeros(2)
    for _ in range(3):
        sig = 1.0 / (1.0 + np.exp(-(w[0] + w[1] * x)))
        g0 = (np.sum(scale9(sig - y)) / 1.0e9) / len(x)
        g1 = (np.sum(scale9((sig - y) * x)) / 1.0e9) / len(x)
        w[0] -= 1.0 * g0
        w[1] -= 1.0 * g1
    sig_l = scale9(1.0 / (1.0 + np.exp(-(w[0] + w[1] * x))))
    acc = np.mean((sig_l > 500000000) == (y == 1.0))
    assert (r["w0"], r["w1"]) == (round(w[0], 6), round(w[1], 6))
    assert r["accuracy"] == round(float(acc), 6)
    assert r["n"] == 6


def test_markov_attribution_hand_computed(spark):
    """3 journeys: click->purchase, view->(no conv), bare purchase.
    P(conv) = 2/3; removing click drops it to 1/3 (effect 0.5); removing
    view changes nothing (effect 0) -> shares 1.0 / 0.0."""
    import datetime as dt

    from d2b_dataframework_spark.operators.attribution import (
        markov_removal_attribution,
        markov_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "click", 1),
        (1, t0 + dt.timedelta(hours=1), "purchase", 2),
        (2, t0, "view", 3),
        (3, t0, "purchase", 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    trans = markov_transitions(ev, "user_id", "ts", "event_type", "purchase", "event_id")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in trans.collect()
    }
    third = 1.0 / 3.0
    assert got == {
        ("start", "click"): (1, third),
        ("start", "view"): (1, third),
        ("start", "conv"): (1, third),
        ("click", "conv"): (1, 1.0),
        ("view", "null"): (1, 1.0),
    }
    out = {
        r["channel"]: r
        for r in markov_removal_attribution(trans, ["click", "view"]).collect()
    }
    assert out["click"]["p_conv_full"] == round(2.0 / 3.0, 6)
    assert out["click"]["p_conv_removed"] == round(1.0 / 3.0, 6)
    assert out["click"]["removal_effect"] == 0.5
    assert out["click"]["attribution_share"] == 1.0
    assert out["view"]["removal_effect"] == 0.0
    assert out["view"]["attribution_share"] == 0.0


def test_shapley_attribution_hand_computed(spark):
    """Journeys: {click}->conv, {click,view}->conv, {view}->no conv.
    v({click})=1, v({view})=0, v({click,view})=2, v(empty)=0.
    phi*2! : click = 1*(1-0) + 1*(2-0) = 3; view = 1*0 + 1*(2-1) = 1."""
    import datetime as dt

    from d2b_dataframework_spark.operators.attribution import shapley_attribution

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0, "click", 1), (1, t0 + h, "purchase", 2),
        (2, t0, "click", 3), (2, t0 + h, "view", 4), (2, t0 + 2 * h, "purchase", 5),
        (3, t0, "view", 6),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {
        r["channel"]: r
        for r in shapley_attribution(
            ev, "user_id", "ts", "event_type", "purchase", ["click", "view"]
        ).collect()
    }
    assert out["click"]["phi_scaled"] == 3
    assert out["view"]["phi_scaled"] == 1
    assert out["click"]["shapley_conversions"] == 1.5
    assert out["view"]["shapley_conversions"] == 0.5
    assert out["click"]["attribution_share"] == 0.75
    assert out["view"]["attribution_share"] == 0.25


def test_quantile_regression_gd_replay(spark):
    """5 subgradient steps == NumPy replay of the same rounded updates;
    coverage counts y <= pred."""
    import numpy as np

    from d2b_dataframework_spark.datapipe.classify import quantile_regression_gd

    xs = [(-2.0, -1.5), (-1.0, -0.5), (0.0, 0.2), (1.0, 1.1), (2.0, 2.4)]
    df = spark.createDataFrame(xs, "x1 double, y double")
    r = quantile_regression_gd(df, ["x1"], "y", tau=0.9, iterations=5, lr=1.0).collect()[0]

    def scale9(v):
        return np.where(v >= 0, np.floor(v * 1.0e9 + 0.5),
                        -np.floor(-v * 1.0e9 + 0.5))

    x = np.array([v[0] for v in xs])
    y = np.array([v[1] for v in xs])
    w = np.zeros(2)
    for _ in range(5):
        pred = w[0] + w[1] * x
        ind = (y < pred).astype(float) - 0.9
        w[0] -= (np.sum(scale9(ind)) / 1.0e9) / len(x)
        w[1] -= (np.sum(scale9(ind * x)) / 1.0e9) / len(x)
    pred = w[0] + w[1] * x
    u = y - pred
    pin = np.where(u >= 0, 0.9 * u, (0.9 - 1.0) * u)
    assert (r["w0"], r["w1"]) == (round(w[0], 6), round(w[1], 6))
    assert r["pinball_loss"] == round(float(np.sum(scale9(pin)) / 1.0e9 / len(x)), 6)
    assert r["coverage"] == round(float(np.mean(y <= pred)), 6)


def test_als_user_step_solves_normal_equations(spark):
    """The per-user factor pair must equal a NumPy 2x2 ridge solve over
    the same md5-derived item factors."""
    import hashlib

    import numpy as np

    from d2b_dataframework_spark.plans.queries import REGISTRY

    out = {r["user_id"]: r for r in
           REGISTRY["als_user_step"].spark(spark, "/root/testdata/sf0.001").collect()}
    assert out  # at least one user with >= 20 rated items

    def mdu(salt, item):
        h = int(hashlib.md5(f"{salt}:{item}".encode()).hexdigest()[:7], 16)
        return (h % 1000000) / 1000000.0 - 0.5

    def scale9(v):
        return np.where(np.asarray(v) >= 0, np.floor(np.asarray(v) * 1e9 + 0.5),
                        -np.floor(-np.asarray(v) * 1e9 + 0.5))

    # replay one user end-to-end from the raw tables via duckdb
    import duckdb

    con = duckdb.connect()
    uid = sorted(out)[0]
    rows = con.execute(f"""
        SELECT l_partkey, CAST(SUM(l_quantity::DECIMAL(18,2)) AS DOUBLE)
        FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') li
        JOIN read_parquet('/root/testdata/sf0.001/orders.parquet') o
          ON l_orderkey = o_orderkey
        WHERE o_custkey = {uid} GROUP BY 1""").fetchall()
    f1 = np.array([mdu("alsf1", i) for i, _ in rows])
    f2 = np.array([mdu("alsf2", i) for i, _ in rows])
    y = np.array([r for _, r in rows])
    s = lambda v: float(np.sum(scale9(v))) / 1e9  # noqa: E731
    a, d, b = s(f1 * f1) + 0.1, s(f2 * f2) + 0.1, s(f1 * f2)
    s1y, s2y = s(f1 * y), s(f2 * y)
    det = a * d - b * b
    u1 = (d * s1y - b * s2y) / det
    u2 = (a * s2y - b * s1y) / det
    assert out[uid]["n_items"] == len(rows)
    assert (out[uid]["u1"], out[uid]["u2"]) == (round(u1, 6), round(u2, 6))


def test_interval_group_sizes_reports_capped_keys(spark):
    from d2b_dataframework_spark.operators.intervals import interval_group_sizes

    rows = [("hot", i, 0, 100) for i in range(5)] + [("cold", 10, 0, 5)]
    df = spark.createDataFrame(rows, "g string, id long, s long, e long")
    got = interval_group_sizes(df, ["g"], max_group_size=3).collect()
    assert [(r["g"], r["group_size"]) for r in got] == [("hot", 5)]
