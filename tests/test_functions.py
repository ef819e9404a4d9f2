"""Unit tests for the scalar-function library (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2b_dataframework_spark.functions import casts, colnames, datetimes, money, nested, strings


def test_clean_bq_name():
    assert colnames.clean_bq_name("ga:Users & Sessions") == "users_sessions"
    assert colnames.clean_bq_name("Campaña  Año") == "campana_ano"
    assert colnames.clean_bq_name("already_clean") == "already_clean"


def test_rename_map_collisions():
    m = colnames.rename_map(["a.b", "c.b", "x"], scheme="leaf")
    assert m == {"a.b": "b", "c.b": "b_2", "x": "x"}


def test_x_ads_scrub():
    assert colnames.clean_x_ads("request_params_entity.ids") == "entityids"


def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["ga:Users", "Total & Neto"])
    out = colnames.normalize_columns(df)
    assert out.columns == ["users", "total_neto"]


def test_urn_id(spark):
    df = spark.createDataFrame([("urn:li:organization:123",)], ["urn"])
    assert df.select(strings.urn_id("urn").alias("x")).first().x == "123"


def test_truncate_and_normalize_ws(spark):
    df = spark.createDataFrame([("  a   b  c ",)], ["t"])
    assert df.select(strings.normalize_whitespace("t").alias("x")).first().x == "a b c"


def test_epoch_ms_roundtrip(spark):
    df = spark.createDataFrame([(1704164645123,)], ["ms"])
    row = df.select(
        datetimes.epoch_ms_to_utc_ts("ms").alias("ts")
    ).select(datetimes.utc_ts_to_epoch_ms("ts").alias("ms2")).first()
    assert row.ms2 == 1704164645123


def test_parse_dual_date(spark):
    df = spark.createDataFrame([("2024-01-02",), ("20240102",), ("junk",)], ["d"])
    vals = [r.p for r in df.select(datetimes.parse_dual_date("d").alias("p")).collect()]
    assert str(vals[0]) == "2024-01-02" and str(vals[1]) == "2024-01-02" and vals[2] is None


def test_to_numeric_coerce(spark):
    df = spark.createDataFrame([("12",), ("x",)], ["v"])
    vals = [r.n for r in df.select(casts.to_numeric("v", "long").alias("n")).collect()]
    assert vals == [12, None]


def test_fill_zero_and_clip(spark):
    df = spark.createDataFrame([(None,), (5,)], "v: int")
    assert [r.x for r in df.select(casts.fill_zero_long("v").alias("x")).collect()] == [0, 5]
    df2 = spark.createDataFrame([(-3.0,), (2.0,)], "v: double")
    assert [r.x for r in df2.select(casts.clip_min("v").alias("x")).collect()] == [0.0, 2.0]


def test_action_value(spark):
    rows = [([{"action_type": "link_click", "value": 7}],)]
    df = spark.createDataFrame(rows, "actions: array<struct<action_type:string,value:int>>")
    got = df.select(
        nested.action_value("actions", "link_click").alias("a"),
        nested.action_value("actions", "purchase").alias("b"),
    ).first()
    assert got.a == 7 and got.b == 0


def test_lifetime_value(spark):
    rows = [
        ([{"period": "day", "value": 1}, {"period": "lifetime", "value": 9}],),
        ([{"period": "day", "value": 3}],),
        ([],),
    ]
    df = spark.createDataFrame(rows, "vals: array<struct<period:string,value:int>>")
    got = [r.x for r in df.select(nested.lifetime_value("vals", default=-1).alias("x")).collect()]
    assert got == [9, 3, -1]


def test_content_type(spark):
    rows = [
        ({"article": "a", "media": None, "multiImage": None},),
        ({"article": None, "media": "m", "multiImage": None},),
        ({"article": None, "media": None, "multiImage": None},),
    ]
    schema = "content: struct<article:string,media:string,multiImage:string>"
    df = spark.createDataFrame(rows, schema)
    got = [r.x for r in df.select(nested.content_type("content").alias("x")).collect()]
    assert got == ["ARTICLE", "MEDIA", "NONE"]


def test_expand_map_to_columns(spark):
    df = spark.createDataFrame([({"like": 3},)], "reactions: map<string,int>")
    out = nested.expand_map_to_columns(df, "reactions", ["like", "love"], prefix="reactions_")
    row = out.first()
    assert row.reactions_like == 3 and row.reactions_love == 0


def test_refund_totals(spark):
    rows = [
        (
            [
                {
                    "refund_line_items": [{"subtotal": 10.0, "total_tax": 2.0}],
                    "order_adjustments": [{"amount": -5.0, "kind": "shipping_refund"}],
                }
            ],
        )
    ]
    schema = (
        "refunds: array<struct<refund_line_items:array<struct<subtotal:double,total_tax:double>>,"
        "order_adjustments:array<struct<amount:double,kind:string>>>>"
    )
    df = spark.createDataFrame(rows, schema)
    returns, shipping = money.refund_totals("refunds")
    got = df.select(returns.alias("r"), shipping.alias("s")).first()
    assert got.r == 12.0 and got.s == 5.0


def test_order_financials(spark):
    df = spark.createDataFrame(
        [(100.0, 10.0, 5.0, 3.0, 1.0, 1.0, 8.0)],
        ["gross_sales", "discounts", "returns", "shipping_charges", "duties", "additional_fees", "taxes"],
    )
    out = money.order_financials(df).first()
    assert out.net_sales == 85.0
    assert out.total_sales == 98.0
    assert out.custom_total_sales == 93.0


def test_region_day_bounds(spark):
    start, end = datetimes.region_day_bounds(F.lit("2024-06-01"), "chile")
    row = spark.range(1).select(start.alias("s"), end.alias("e")).first()
    # Chile is UTC-4 in June (winter): local midnight = 04:00 UTC
    assert str(row.s) == "2024-06-01 04:00:00"
    assert str(row.e) == "2024-06-02 03:59:59"
