"""Operator-layer tests: dedup windows, joins, pivots, unions (SURVEY
§2.4–§2.6 semantics)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from d2b_dataframework_spark.operators.dedup import keep_latest
from d2b_dataframework_spark.operators.joins import broadcast_dim_join, left_join_fill_zero
from d2b_dataframework_spark.operators.pivots import pivot_wide
from d2b_dataframework_spark.operators.unions import concat


def test_keep_latest_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1),
            ("a", "2024-01-02 00:00:00", 2),
            ("a", "2024-01-02 00:00:00", 3),  # ts tie → tiebreaker wins
            ("b", None, 4),
            ("b", "2024-01-01 00:00:00", 5),  # valid ts beats null
        ],
        "k string, ts_raw string, v int",
    ).withColumn("ts", F.to_timestamp("ts_raw"))
    out = {r["k"]: r["v"] for r in keep_latest(df, "k", "ts", tiebreakers=["v"]).collect()}
    assert out == {"a": 3, "b": 5}


def test_left_join_fill_zero_types(spark):
    left = spark.createDataFrame([("p1",), ("p2",)], "id string")
    right = spark.createDataFrame([("p1", 7)], "id string, likes long")
    out = left_join_fill_zero(left, right, "id", fill_cols=["likes"], cast="long")
    rows = {r["id"]: r["likes"] for r in out.collect()}
    assert rows == {"p1": 7, "p2": 0}
    assert dict(out.dtypes)["likes"] == "bigint"


def test_broadcast_dim_join_plans_broadcast(spark):
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(1, "x")], "k long, name string")
    out = broadcast_dim_join(fact, dim, fact.k == dim.k, "left")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_pivot_wide_with_declared_values(spark):
    df = spark.createDataFrame(
        [("d1", "click", 1.0), ("d1", "view", 2.0), ("d2", "click", 3.0)],
        "day string, metric string, v double",
    )
    out = pivot_wide(df, "day", "metric", "v", agg="sum", pivot_values=["click", "view"])
    rows = {r["day"]: (r["click"], r["view"]) for r in out.collect()}
    assert rows == {"d1": (1.0, 2.0), "d2": (3.0, None)}


def test_concat_aligns_by_name_null_fills(spark):
    a = spark.createDataFrame([(1, "x")], "id long, only_a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, only_b double")
    out = concat([a, b])
    assert set(out.columns) == {"id", "only_a", "only_b"}
    rows = {r["id"]: (r["only_a"], r["only_b"]) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, 9.5)}


# ---------------------------------------------------------------------------
# sessionize / session_summary
# ---------------------------------------------------------------------------


def test_sessionize_gap_boundaries(spark):
    from d2b_dataframework_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00"),
            (1, 2, "2024-01-01 10:29:00"),  # 29m gap -> same session
            (1, 3, "2024-01-01 11:00:00"),  # 31m gap -> new session
            (2, 4, "2024-01-01 10:00:00"),
        ],
        "user_id long, event_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {r["event_id"]: (r["session_idx"], r["session_id"])
           for r in sessionize(df, gap_minutes=30).collect()}
    assert out == {1: (0, "1-0"), 2: (0, "1-0"), 3: (1, "1-1"), 4: (0, "2-0")}


def test_sessionize_gap_exactly_at_threshold_stays(spark):
    from d2b_dataframework_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (1, 2, "2024-01-01 10:30:00")],
        "user_id long, event_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = sessionize(df, gap_minutes=30).select("session_idx").distinct().collect()
    assert [r["session_idx"] for r in out] == [0]  # gap == threshold: same session


def test_session_summary_rollup(spark):
    from d2b_dataframework_spark.operators.sessions import session_summary

    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00", "view", 1.0),
            (1, 2, "2024-01-01 10:10:00", "click", 2.5),
            (1, 3, "2024-01-02 10:00:00", "view", 4.0),
        ],
        "user_id long, event_id long, ts_s string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    rows = {(r["user_id"], r["session_idx"]): r
            for r in session_summary(df, gap_minutes=30).collect()}
    s0 = rows[(1, 0)]
    assert s0["n_events"] == 2 and s0["n_event_types"] == 2
    assert s0["duration_us"] == 600 * 1_000_000
    assert s0["total_value"] == 3.5
    assert rows[(1, 1)]["n_events"] == 1


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "k", "2024-01-05"), (2, "k", "2024-01-10"), (3, "k", "2024-01-02"),
         (4, "z", "2024-01-05")],
        "event_id long, k string, d string",
    ).withColumn("ts", F.to_timestamp("d")).drop("d")
    right = spark.createDataFrame(
        [("k", "2024-01-03", 30), ("k", "2024-01-10", 100), ("k", "2024-01-20", 999)],
        "k string, d string, px long",
    ).withColumn("rts", F.to_timestamp("d")).drop("d")
    return left, right


def test_asof_join_backward_with_equal_ts_and_nulls(spark):
    from d2b_dataframework_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["px"])
    rows = {r["event_id"]: r["px"] for r in out.collect()}
    # e1: latest rts<=Jan5 is Jan3 -> 30; e2: equal ts matches -> 100
    # e3: no prior right row -> NULL; e4: key with no right rows -> NULL
    assert rows == {1: 30, 2: 100, 3: None, 4: None}
    assert out.count() == 4  # left-preserving


def test_asof_join_dedup_tiebreaker_picks_max(spark):
    from d2b_dataframework_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", "2024-01-05")], "event_id long, k string, d string")
    left = left.withColumn("ts", F.to_timestamp("d")).drop("d")
    right = spark.createDataFrame(
        [("k", "2024-01-03", 1, 10.0), ("k", "2024-01-03", 2, 20.0)],
        "k string, d string, seq long, px double",
    ).withColumn("rts", F.to_timestamp("d")).drop("d")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["seq", "px"], dedup_tiebreaker="seq")
    r = out.collect()[0]
    assert (r["seq"], r["px"]) == (2, 20.0)


def test_asof_join_single_shuffle_plan(spark):
    from d2b_dataframework_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-sort formulation: no join operator at all, exactly one exchange
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# salted aggregation / percentiles
# ---------------------------------------------------------------------------


def test_salted_sum_matches_plain_groupby(spark):
    from d2b_dataframework_spark.operators.aggregates import salted_sum

    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)] + [("cold", 1.0)],
        "k string, v double",
    )
    out = salted_sum(
        df, "k",
        {"n": F.lit(1).cast("long"), "s": F.col("v").cast("decimal(18,2)")},
        buckets=8,
    )
    rows = {r["k"]: (r["n"], float(r["s"])) for r in out.collect()}
    assert rows == {"hot": (500, float(sum(range(500)))), "cold": (1, 1.0)}


def test_salted_sum_plans_two_aggregation_stages(spark):
    from d2b_dataframework_spark.operators.aggregates import salted_sum

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    out = salted_sum(df, "k", {"s": F.col("v")}, buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two logical stages -> >=4 HashAggregate nodes (partial+final each)
    assert plan.count("HashAggregate") >= 4


def test_exact_percentiles_interpolation(spark):
    from d2b_dataframework_spark.operators.aggregates import exact_percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)], "k string, v double"
    )
    r = exact_percentiles(df, "k", "v", [0.5, 0.9]).collect()[0]
    assert r["p50"] == 2.5          # continuous interpolation, not nearest
    assert r["p90"] == pytest.approx(3.7)


def test_scd2_apply_versions_changes_and_is_idempotent(spark):
    from d2b_dataframework_spark.operators.scd import scd2_apply

    history = spark.createDataFrame(
        [(1, 10.0, "A", "d0", None, True),
         (2, 20.0, "B", "d0", None, True),
         (2, 15.0, "B", "c0", "d0", False)],  # prior closed version
        "k long, bal double, seg string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, 11.0, "A", "d1"),   # changed -> close + open
         (2, 20.0, "B", "d1"),   # identical -> no-op
         (3, 30.0, "C", "d1")],  # new key -> insert
        "k long, bal double, seg string, effective_date string",
    )
    out = scd2_apply(history, updates, "k", ["bal", "seg"])
    rows = {(r["k"], r["valid_from"]): r for r in out.collect()}
    assert len(rows) == 5
    assert rows[(1, "d0")]["valid_to"] == "d1" and not rows[(1, "d0")]["is_current"]
    assert rows[(1, "d1")]["bal"] == 11.0 and rows[(1, "d1")]["is_current"]
    assert rows[(2, "d0")]["is_current"] and rows[(2, "d0")]["valid_to"] is None
    assert (2, "c0") in rows  # closed-out history carried through
    assert rows[(3, "d1")]["is_current"]
    # idempotent: re-applying the same batch changes nothing
    again = scd2_apply(out, updates, "k", ["bal", "seg"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_unpivot_inverts_pivot(spark):
    from d2b_dataframework_spark.operators.pivots import pivot_wide, unpivot_long

    df = spark.createDataFrame(
        [("d1", "a", 1.0), ("d1", "b", 2.0), ("d2", "a", 3.0)],
        "day string, k string, v double",
    )
    wide = pivot_wide(df, "day", "k", "v", agg="sum", pivot_values=["a", "b"])
    long = unpivot_long(wide, ["day"], ["a", "b"], "k", "v")
    got = {(r["day"], r["k"]): r["v"] for r in long.collect()}
    assert got == {("d1", "a"): 1.0, ("d1", "b"): 2.0,
                   ("d2", "a"): 3.0, ("d2", "b"): None}
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # unpivot is a per-row flatMap, not a shuffle


def test_parquet_filter_pushdown_reaches_scan(spark, sf_dir):
    """Selective predicates must reach the parquet reader (PushedFilters)
    and projection must prune the read schema — the two properties that
    decide whether a 100TB scan reads 100TB or a sliver."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(l_quantity,5" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_approx_functions_within_tolerance(spark, sf_dir):
    """The documented 100TB paths for distinct counts and quantiles are
    approx_count_distinct / percentile_approx; pin their error envelope
    vs the exact answers so a regression in accuracy (or a silently
    changed rsd) is caught."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)").alias("exact_p90"),
        F.percentile_approx("value", 0.9, 1000).alias("approx_p90"),
    ).collect()[0]
    assert abs(row["approx_users"] - row["exact_users"]) <= 0.1 * row["exact_users"]
    assert abs(row["approx_p90"] - row["exact_p90"]) <= 0.05 * abs(row["exact_p90"]) + 1e-9


def test_key_skew_stats_flags_hot_key(spark):
    from d2b_dataframework_spark.operators.aggregates import key_skew_stats

    rows = [(i, "hot") for i in range(90)] + [(100 + i, f"cold{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = key_skew_stats(df, "k", top_n=3).collect()
    top = out[0]
    assert top["rank"] == 1 and top["key"] == "hot" and top["n"] == 90
    # 11 keys, 100 rows -> mean ~9.09; hot key 90 -> ratio ~9.9
    assert top["max_over_mean"] > 9 and top["row_share"] == 0.9


def test_snapshot_diff_classifies_all_cases(spark):
    from d2b_dataframework_spark.operators.aggregates import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_hll_partials_store_merge_roundtrip(spark, sf_dir, tmp_path):
    """The mergeable-sketch contract: per-day HLL partials written to
    parquet, read back, and merged must estimate the same distinct count
    as one sketch over the raw rows — and land within the lg_k=12 error
    envelope (~1.6% rsd) of the exact answer. This is the 100TB distinct
    path: the merge leg aggregates KB-sized sketch state, not raw events."""
    from d2b_dataframework_spark.operators.sketches import hll_merge, hll_partials

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "date", F.to_date("ts")
    )
    daily = hll_partials(ev, "date", "user_id")
    path = str(tmp_path / "hll_daily")
    daily.write.mode("overwrite").parquet(path)

    stored = spark.read.parquet(path).withColumn("all", F.lit(1))
    merged = hll_merge(stored, "all").collect()[0]["distinct_estimate"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    exact = ev.select("user_id").distinct().count()
    assert merged == direct  # merge of partials == single-pass sketch
    assert abs(merged - exact) <= max(3, 0.05 * exact)


def test_theta_partials_support_overlap(spark):
    """Theta's set algebra from STORED partials: overlap of two segments
    estimated from their sketches matches the exact intersection on a
    small-cardinality input (theta is exact until it saturates 2^lg_k)."""
    from d2b_dataframework_spark.operators.sketches import theta_overlap, theta_partials

    rows = [("a", i) for i in range(200)] + [("b", i) for i in range(100, 350)]
    df = spark.createDataFrame(rows, ["segment", "uid"])
    parts = theta_partials(df, "segment", "uid")
    wide = (
        parts.groupBy()
        .pivot("segment", ["a", "b"])
        .agg(F.first("theta_sketch"))
    )
    got = wide.select(
        theta_overlap(F.col("a"), F.col("b")).alias("overlap")
    ).collect()[0]["overlap"]
    assert got == 100  # ids 100..199 in both; exact in sub-saturation mode


def test_global_row_number_matches_single_partition_window(spark):
    from pyspark.sql import Window

    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.operators.ranking import global_row_number

    df = spark.range(0, 997).select(
        F.col("id"),
        (F.hash(F.col("id")) % 100).alias("v"),
    )
    ranked = global_row_number(df, [F.col("v").asc(), F.col("id").asc()], rank_col="rn")
    got = {r["id"]: r["rn"] for r in ranked.collect()}
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
        ).collect()
    }
    assert got == want
    release(ranked)


def test_global_row_number_desc_and_plan_has_no_global_window(spark):
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.operators.ranking import global_row_number

    df = spark.range(0, 200).select(F.col("id"), (F.col("id") % 7).alias("v"))
    ranked = global_row_number(df, [F.col("v").desc(), F.col("id").desc()], rank_col="rn")
    rows = sorted((r["rn"], r["v"], r["id"]) for r in ranked.collect())
    # rank 1 = largest (v, id)
    assert rows[0][1:] == (6, 195)
    assert rows[-1][0] == 200 and rows[-1][1:] == (0, 0)
    # the plan's only Window is partitioned by spark_partition_id — never
    # a single-partition global sort
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "SPARK_PARTITION_ID" in plan
    release(ranked)


@pytest.mark.parametrize("n,k", [(10, 4), (12, 4), (3, 4), (997, 5), (100, 1)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    from pyspark.sql import Window

    from d2b_dataframework_spark.operators.ranking import ntile_from_rank

    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = {
        r["rn"]: r["ph"]
        for r in df.select("rn", ntile_from_rank("rn", F.lit(n), k).alias("ph")).collect()
    }
    want = {
        r["rn"]: r["ph"]
        for r in spark.range(0, n)
        .withColumn("rn", F.col("id") + 1)
        .select("rn", F.ntile(k).over(Window.orderBy("rn")).alias("ph"))
        .collect()
    }
    assert got == want


def test_grouped_topk_salted_equals_unsalted(spark):
    from d2b_dataframework_spark.operators.aggregates import grouped_topk

    df = spark.range(0, 2000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").alias("rid"),
        (F.hash("id") % 1000).alias("score"),
    )
    order = [F.col("score").desc(), F.col("rid").asc()]
    plain = grouped_topk(df, ["g"], order, 7)
    salted = grouped_topk(df, ["g"], order, 7, pre_salt=16, salt_on="rid")
    key = lambda rows: sorted((r["g"], r["rank"], r["rid"]) for r in rows)
    assert key(plain.collect()) == key(salted.collect())
    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], order, 7, pre_salt=4)


def test_last_touch_attribution_credits_most_recent_touch(spark):
    from d2b_dataframework_spark.operators.attribution import last_touch_attribution

    rows = [
        # user 1: view, click, purchase → click credited
        (1, 1, "2024-01-01 00:00:00", "view", 0.0),
        (2, 1, "2024-01-02 00:00:00", "click", 0.0),
        (3, 1, "2024-01-03 00:00:00", "purchase", 10.0),
        # user 2: purchase with no prior touch → none
        (4, 2, "2024-01-01 00:00:00", "purchase", 5.0),
        # user 2: later view then purchase → view
        (5, 2, "2024-01-02 00:00:00", "view", 0.0),
        (6, 2, "2024-01-03 00:00:00", "purchase", 7.0),
        # touch AFTER the purchase must not be credited
        (7, 2, "2024-01-04 00:00:00", "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {
        r["touch_type"]: (r["n_conversions"], r["attributed_value"])
        for r in last_touch_attribution(ev, ["click", "view"], "purchase").collect()
    }
    assert out == {"click": (1, 10.0), "none": (1, 5.0), "view": (1, 7.0)}


def test_cohort_retention_offsets(spark):
    from d2b_dataframework_spark.operators.attribution import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-03 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        (3, "2024-01-02 09:00:00"),
        (3, "2024-01-02 23:00:00"),  # same day twice → one active day
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_priority_sample_is_deterministic_and_weight_biased(spark):
    from d2b_dataframework_spark.datapipe.splits import priority_sample_topk

    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, 1).otherwise(1000).cast("long").alias("w"),
    )
    s1 = priority_sample_topk(df, "w", 50).collect()
    s2 = priority_sample_topk(df, "w", 50).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    heavy = sum(1 for r in s1 if r["doc_id"] >= 200)
    assert heavy >= 45  # 1000x weight dominates the sample


def test_zorder_value_interleaves_bits(spark):
    from d2b_dataframework_spark.operators.layout import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_value("x", "y", bits=4).alias("z")).collect()
    }
    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z
    assert got == {(x, y): morton(x, y) for (x, y) in got}


def test_quality_report_counts_violations(spark):
    from d2b_dataframework_spark.operators.quality import (
        expect_columns,
        expect_ref_integrity,
        expect_unique,
        quality_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (2, None), (4, 5.0)], "k long, v double"
    )
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    rep = quality_report(
        expect_columns(df, {"v_pos": F.col("v") > 0}),  # -1 and NULL violate
        expect_unique(df, ["k"]),                        # k=2 twice
        expect_ref_integrity(df, "k", parent, "k"),      # k=4 orphan
    )
    rows = {r["check"]: (r["n_violations"], r["n_rows"], r["passed"]) for r in rep.collect()}
    assert rows["v_pos"] == (2, 4, False)
    assert rows["unique(k)"] == (1, 4, False)
    assert rows["fk(k->k)"] == (1, 4, False)


def test_pairwise_pearson_matches_numpy(spark):
    import numpy as np

    from d2b_dataframework_spark.operators.stats import pairwise_pearson

    rng = [(float(i), float(i) * 2.0 + 1.0, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rng, "a double, b double, c double")
    out = {
        (r["metric_x"], r["metric_y"]): r["corr"]
        for r in pairwise_pearson(df, ["a", "b", "c"]).collect()
    }
    arr = np.array(rng)
    assert abs(out[("a", "b")] - 1.0) < 1e-9  # perfectly linear
    want_ac = np.corrcoef(arr[:, 0], arr[:, 2])[0, 1]
    assert abs(out[("a", "c")] - want_ac) < 1e-6
    # order-independence: repartitioned input gives bit-identical output
    out2 = {
        (r["metric_x"], r["metric_y"]): r["corr"]
        for r in pairwise_pearson(df.repartition(17), ["a", "b", "c"]).collect()
    }
    assert out == out2


def test_zscore_normalize_grouped(spark):
    from d2b_dataframework_spark.operators.stats import zscore_normalize

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)], "g string, v double"
    )
    out = {(r["g"], r["v"]): r["v_z"] for r in zscore_normalize(df, ["v"], by=["g"]).collect()}
    # group a: mean 2, pop std 1 → z = ±1
    assert out[("a", 1.0)] == -1.0 and out[("a", 3.0)] == 1.0
    # group b: zero variance → null
    assert out[("b", 10.0)] is None


def test_fuzzy_match_pairs_blocks_and_thresholds(spark):
    from d2b_dataframework_spark.operators.fuzzy import fuzzy_match_pairs

    df = spark.createDataFrame(
        [("red bolt",), ("red bolt",), ("rad bolt",), ("red ring",), ("blue bolt",)],
        "name string",
    )
    out = fuzzy_match_pairs(
        df, "name", F.split(F.col("name"), " ").getItem(1), max_distance=1
    ).collect()
    pairs = {(r["value_a"], r["value_b"]): r["distance"] for r in out}
    # duplicates collapse; cross-block ("red ring") never compared
    assert pairs == {("rad bolt", "red bolt"): 1}


def test_resample_daily_ffill_fills_gaps(spark):
    from d2b_dataframework_spark.operators.timeseries import resample_daily_ffill

    actual = spark.createDataFrame(
        [("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0), ("b", "2024-01-02", 2.0)],
        "k string, d_s string, v double",
    ).select("k", F.to_date("d_s").alias("d"), "v")
    out = {
        (r["k"], str(r["d"])): (r["v"], r["was_filled"])
        for r in resample_daily_ffill(actual, "k", "d", "v").collect()
    }
    assert out[("a", "2024-01-01")] == (1.0, False)
    assert out[("a", "2024-01-02")] == (1.0, True)   # filled forward
    assert out[("a", "2024-01-03")] == (1.0, True)
    assert out[("a", "2024-01-04")] == (4.0, False)
    assert out[("b", "2024-01-02")] == (2.0, False)
    assert len(out) == 5  # b has a single-day span


def test_flatten_hierarchy_paths_and_roots(spark):
    from d2b_dataframework_spark.operators.hierarchy import flatten_hierarchy

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "a")], "child string, parent string"
    )
    out = {r["node"]: (r["root"], r["depth"], r["path"]) for r in flatten_hierarchy(edges).collect()}
    assert out["d"] == ("a", 3, "a/b/c/d")
    assert out["c"] == ("a", 2, "a/b/c")
    assert out["x"] == ("a", 1, "a/x")
    assert out["a"] == ("a", 0, "a")  # root included


def test_grid_neighbor_pairs_finds_close_points_once(spark):
    from d2b_dataframework_spark.operators.spatial import grid_neighbor_pairs

    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 0, 0),
            (2, 0.01, 0.01, 0, 0),     # ~1.6 km from 1
            (3, 0.05, -0.02, 1, 0),    # adjacent cell, ~6 km from 1
            (4, 1.0, 1.0, 20, 20),     # far away
        ],
        "cid long, lat double, lon double, cx long, cy long",
    )
    out = grid_neighbor_pairs(pts, "cid", "lat", "lon", F.col("cx"), F.col("cy"), 5.0).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs and (1, 4) not in pairs
    assert len(out) == len(pairs)  # each pair exactly once


def test_time_decay_attribution_normalizes_per_conversion(spark):
    from d2b_dataframework_spark.operators.attribution import time_decay_attribution

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view", 0.0),
        (2, 1, "2024-01-08 00:00:00", "click", 0.0),   # 1 halflife closer
        (3, 1, "2024-01-08 00:00:00", "purchase", 30.0),
        (4, 2, "2024-01-01 00:00:00", "view", 0.0),    # touch with no conversion
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {
        r["touch_type"]: r["attributed_value"]
        for r in time_decay_attribution(ev, ["click", "view"], "purchase", 7.0).collect()
    }
    # weights: click at dt=0 -> 1.0; view at dt=7d -> 0.5; credits 20 / 10
    assert abs(out["click"] - 20.0) < 1e-6
    assert abs(out["view"] - 10.0) < 1e-6
    # total credit equals total conversion value
    assert abs(sum(out.values()) - 30.0) < 1e-6


def test_salted_join_matches_plain_join(spark):
    from d2b_dataframework_spark.operators.joins import salted_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [("0", "a"), ("1", "b"), ("2", "c")], "k string, label string"
    )
    plain = fact.join(dim, "k").select("k", "v", "label")
    salted = salted_join(fact, dim, "k", buckets=8).select("k", "v", "label")
    key = lambda rows: sorted((r["k"], r["v"], r["label"]) for r in rows)
    assert key(plain.collect()) == key(salted.collect())


def test_clamped_running_balance_floors_and_counts(spark):
    from d2b_dataframework_spark.operators.recurrence import clamped_running_balance

    rows = [
        (1, 1, 10.0), (1, 2, -25.0), (1, 3, 5.0),   # clamps once, ends at 5
        (2, 1, -3.0), (2, 2, 4.0),                   # clamps immediately, ends 4
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, delta double")
    out = {
        r["key"]: (r["balance"], r["n_clamped"])
        for r in clamped_running_balance(df, "user_id", ["seq"], "delta").collect()
    }
    assert out == {1: (5.0, 1), 2: (4.0, 1)}


def test_bloom_prefilter_no_false_negatives_and_reduces_rows(spark):
    from d2b_dataframework_spark.operators.joins import bloom_prefilter

    big = spark.range(0, 20000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    small = spark.range(0, 20000, 97).select(F.col("id").alias("k"))  # ~206 keys
    filtered = bloom_prefilter(big, small, "k", fpp=0.01)
    true_keys = {r["k"] for r in small.collect()}
    kept = {r["k"] for r in filtered.collect()}
    assert true_keys <= kept                      # no false negatives
    assert len(kept) < 20000 * 0.05               # massive reduction at ~1% fpp
    # end-to-end: join after prefilter == join without it
    j1 = big.join(small, "k").count()
    j2 = filtered.join(small, "k").count()
    assert j1 == j2


def test_hll_ndv_tolerance_and_bounded_shuffle(spark):
    """Deterministic-HLL NDV: within sketch tolerance of exact, and the
    register aggregation never carries raw values through the shuffle."""
    from d2b_dataframework_spark.operators.ndv_sketch import hll_ndv

    df = spark.range(0, 30000).select(
        F.col("id").alias("high_card"),           # ndv 30000
        (F.col("id") % 500).alias("mid_card"),    # ndv 500
        (F.col("id") % 7).alias("low_card"),      # ndv 7
    )
    got = {r["column"]: r["ndv_approx"] for r in hll_ndv(df, ["high_card", "mid_card", "low_card"]).collect()}
    # m=1024 -> rse ~3.3%; assert a generous 4-sigma band for stability
    assert abs(got["high_card"] - 30000) / 30000 < 0.13
    assert abs(got["mid_card"] - 500) / 500 < 0.13
    assert got["low_card"] == 7  # linear-counting regime is near-exact
    # plan: two partial-aggregated stages, no global distinct of values
    plan = hll_ndv(df, ["high_card"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per stage


def test_hll_ndv_layout_invariant(spark):
    """Estimate is identical regardless of partitioning/order (the
    fixed-point register sum is order-independent)."""
    from d2b_dataframework_spark.operators.ndv_sketch import hll_ndv

    df = spark.range(0, 5000).select((F.col("id") % 1234).alias("k"))
    a = {r["column"]: r["ndv_approx"] for r in hll_ndv(df, ["k"]).collect()}
    b = {
        r["column"]: r["ndv_approx"]
        for r in hll_ndv(df.repartition(17).sortWithinPartitions(F.col("k").desc()), ["k"]).collect()
    }
    assert a == b


def test_hll_ndv_grouped_matches_ungrouped_per_group(spark):
    """Grouped registers == running the ungrouped sketch per group —
    the mergeability/partition-independence contract."""
    from d2b_dataframework_spark.operators.ndv_sketch import hll_ndv, hll_ndv_grouped

    df = spark.range(0, 12000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 2000).alias("v")
    )
    grouped = {
        r["g"]: r["ndv_approx"]
        for r in hll_ndv_grouped(df, ["g"], "v").collect()
    }
    for g in (0, 1, 2):
        solo = hll_ndv(
            df.filter(F.col("g") == g).select("v"), ["v"]
        ).collect()[0]["ndv_approx"]
        assert grouped[g] == solo



def test_histogram_sketch_merges_and_bounds_error(spark):
    """Sharded partials re-summed == single-pass partials, and each
    quantile estimate is within one bin width of the exact percentile."""
    import numpy as np

    from d2b_dataframework_spark.operators import sketches as sk

    vals = [float(((i * 2654435761) % 9973) / 10.0) for i in range(5000)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    lo, hi, bins = 0.0, 1000.0, 200
    whole = sk.histogram_partials(df, "v", lo, hi, bins)
    shard_a = sk.histogram_partials(df.filter(F.col("id") % 2 == 0), "v", lo, hi, bins)
    shard_b = sk.histogram_partials(df.filter(F.col("id") % 2 == 1), "v", lo, hi, bins)
    merged = shard_a.unionByName(shard_b)
    qs = [0.5, 0.9, 0.99]
    est_whole = {r["q"]: r["est"] for r in sk.histogram_quantiles(whole, lo, hi, bins, qs).collect()}
    est_merged = {r["q"]: r["est"] for r in sk.histogram_quantiles(merged, lo, hi, bins, qs).collect()}
    assert est_whole == est_merged
    width = (hi - lo) / bins
    for q in qs:
        exact = float(np.quantile(np.array(vals), q))
        assert abs(est_whole[q] - exact) <= width, (q, est_whole[q], exact)


def test_histogram_sketch_clamps_out_of_range(spark):
    from d2b_dataframework_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.5), (3, 99.5), (4, 250.0), (5, None)],
        "id long, v double",
    )
    rows = {r["bin"]: r["n"] for r in sk.histogram_partials(df, "v", 0.0, 100.0, 10).collect()}
    assert rows == {0: 2, 9: 2}  # -5 clamps low, 250 clamps high, null dropped


def test_column_stats_one_pass_and_tolerance(spark):
    """approx NDV within 15% of exact on every column; exact mode is
    exact; approx plan is a single aggregation over the scan (one
    shuffle for the final combine, no Expand, no per-column jobs)."""
    from d2b_dataframework_spark.operators.stats import column_stats

    df = spark.createDataFrame(
        [(i, i % 97, None if i % 10 == 0 else f"s{i % 503}") for i in range(5000)],
        "a long, b long, c string",
    )
    exact = {r["column"]: r for r in column_stats(df, ndv="exact").collect()}
    approx = {r["column"]: r for r in column_stats(df, ndv="approx").collect()}
    assert exact["a"]["ndv"] == 5000 and exact["b"]["ndv"] == 97
    assert exact["c"]["ndv"] == 503 and exact["c"]["n_nulls"] == 500
    for c in ("a", "b", "c"):
        assert abs(approx[c]["ndv"] - exact[c]["ndv"]) <= 0.15 * exact[c]["ndv"]
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_str"] == exact[c]["min_str"]
        assert approx[c]["max_str"] == exact[c]["max_str"]
        assert approx[c]["n_rows"] == 5000
    plan = column_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Expand" not in plan
    with pytest.raises(ValueError, match="ndv"):
        column_stats(df, ndv="hll")


def test_cms_estimate_upper_bounds_and_merges(spark):
    """est >= exact for every key; unseen keys read 0; sharded partials
    re-summed give the identical estimates as a single-pass build."""
    from d2b_dataframework_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(i, f"k{i % 50}") for i in range(4000)], "id long, k string"
    )
    whole = sk.cms_partials(df, "k", d=4, w=64)
    sharded = sk.cms_partials(df.filter(F.col("id") % 2 == 0), "k", d=4, w=64).unionByName(
        sk.cms_partials(df.filter(F.col("id") % 2 == 1), "k", d=4, w=64)
    )
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)] + [("missing",)], "k string"
    )
    est_w = {r["k"]: r["est"] for r in sk.cms_estimate(whole, probes, "k", d=4, w=64).collect()}
    est_s = {r["k"]: r["est"] for r in sk.cms_estimate(sharded, probes, "k", d=4, w=64).collect()}
    assert est_w == est_s
    exact = {f"k{i}": 80 for i in range(50)}
    for k, true_n in exact.items():
        assert est_w[k] >= true_n
    assert est_w["missing"] >= 0  # may collide, but never negative


def test_skyline_2d_matches_quadratic_reference(spark):
    """Frontier equals the O(n^2) domination check on a deterministic
    point cloud with planted ties and duplicate frontier points."""
    from d2b_dataframework_spark.operators.ranking import skyline_2d

    pts = [(i, float((i * 37) % 101), float((i * 61) % 97)) for i in range(300)]
    pts += [(1000, 0.0, 96.0), (1001, 0.0, 96.0)]  # duplicate frontier pair
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    expect = set()
    for i, x, y in pts:
        dominated = any(
            ox <= x and oy >= y and (ox < x or oy > y) for _, ox, oy in pts
        )
        if not dominated:
            expect.add(i)
    assert got == expect
    assert {1000, 1001} <= got  # equal points never dominate each other


def test_skyline_2d_has_no_single_partition_window(spark):
    from d2b_dataframework_spark.operators.ranking import skyline_2d

    df = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(100)], "id long, x double, y double"
    )
    out = skyline_2d(df, "x", "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the running-max window must be partitioned by SPARK_PARTITION_ID
    # (a bare `Window [... ORDER BY x]` with no partition spec would be
    # the single-partition global scan this operator exists to avoid)
    assert "SPARK_PARTITION_ID" in plan
    assert plan.count("Window [") == 1


def test_cms_absent_key_estimates_zero_via_empty_cells(spark):
    """A key absent from the sketch must estimate 0 when ANY of its d
    buckets is empty — the empty cell's implicit 0 wins the min (an
    inner-join implementation would report colliding rows' counts)."""
    from d2b_dataframework_spark.operators import sketches as sk

    df = spark.createDataFrame([(i, "only") for i in range(10)], "id long, k string")
    cms = sk.cms_partials(df, "k", d=4, w=64)
    probes = spark.createDataFrame([("only",), ("ghost",)], "k string")
    est = {r["k"]: r["est"] for r in sk.cms_estimate(cms, probes, "k", d=4, w=64).collect()}
    assert est["only"] == 10
    # 'ghost' would need to collide with 'only' in ALL 4 rows (p ~ 64^-4)
    assert est["ghost"] == 0


def test_cusum_alerts_fires_and_resets(spark):
    """A sustained shift fires an alert and resets; values at target
    contribute nothing; peak tracks the pre-reset maximum."""
    from d2b_dataframework_spark.operators.recurrence import cusum_alerts

    rows = [(1, i, 5.0) for i in range(5)]              # on target: s stays 0
    rows += [(1, 10 + i, 9.0) for i in range(4)]        # +3.5/step -> 3.5,7,10.5,14 -> alert at >10
    rows += [(2, i, 4.0) for i in range(10)]            # below target: never fires
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    out = {r["key"]: r for r in cusum_alerts(
        df, "k", ["seq"], "v", target=5.0, slack=0.5, threshold=10.0
    ).collect()}
    assert out[1]["n_alerts"] == 1
    assert out[1]["peak_stat"] == 10.5  # 3.5 * 3 crosses 10, then reset
    assert out[1]["final_stat"] == 3.5  # one step after the reset
    assert out[2]["n_alerts"] == 0 and out[2]["final_stat"] == 0.0


def test_grouped_linreg_exact_line_and_degenerate_guard(spark):
    from d2b_dataframework_spark.operators.stats import grouped_linreg

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(10)]       # perfect line
    rows += [("b", float(x), 5.0) for x in range(10)]                # zero y-variance
    rows += [("c", 3.0, float(x)) for x in range(5)]                 # zero x-variance
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in grouped_linreg(df, ["k"], "x", "y").collect()}
    assert (out["a"]["slope"], out["a"]["intercept"], out["a"]["r2"]) == (2.0, 1.0, 1.0)
    assert out["b"]["slope"] == 0.0 and out["b"]["intercept"] == 5.0 and out["b"]["r2"] is None
    assert out["c"]["slope"] is None and out["c"]["r2"] is None


def test_hll_register_merge_equals_recompute(spark):
    """max-merging two shards' register frames gives the SAME estimate
    as sketching the union directly — the property that lets stored
    daily registers answer any date range."""
    from d2b_dataframework_spark.operators.ndv_sketch import (
        hll_estimate_from_registers,
        hll_registers_grouped,
    )

    df = spark.createDataFrame(
        [(i % 2, f"u{i % 700}") for i in range(4000)], "g int, u string"
    )
    whole = hll_estimate_from_registers(
        hll_registers_grouped(df.select(F.lit(0).alias("g"), "u"), ["g"], "u"), ["g"]
    ).collect()[0]["ndv_approx"]
    shards = hll_registers_grouped(df, ["g"], "u")  # g=0 and g=1 shards
    merged = shards.groupBy("j").agg(F.max("mj").alias("mj")).withColumn(
        "g", F.lit(0)
    )
    via_merge = hll_estimate_from_registers(merged, ["g"]).collect()[0]["ndv_approx"]
    assert whole == via_merge
    assert abs(whole - 700) <= 0.1 * 700  # ~3% expected error at p=10


def test_cms_join_size_upper_bounds_exact(spark):
    """est >= exact always (collision mass adds, never subtracts), and
    with ample width the estimate is exact."""
    from d2b_dataframework_spark.operators import sketches as sk

    a = spark.createDataFrame([(i, f"k{i % 20}") for i in range(400)], "id long, k string")
    b = spark.createDataFrame([(i, f"k{i % 30}") for i in range(300)], "id long, k string")
    exact = (
        a.groupBy("k").count().withColumnRenamed("count", "na")
        .join(b.groupBy("k").count().withColumnRenamed("count", "nb"), "k")
        .agg(F.sum(F.col("na") * F.col("nb"))).collect()[0][0]
    )
    for w in (8, 4096):
        est = sk.cms_join_size_estimate(
            sk.cms_partials(a, "k", d=4, w=w), sk.cms_partials(b, "k", d=4, w=w)
        ).collect()[0]["est"]
        assert est >= exact
        if w == 4096:
            assert est == exact  # 20+30 keys in 4096 buckets: no collisions
