"""Connector tests: fixture payloads through fake transports, asserting
output DataFrame schema + content — the reference suite's mock-payload
style (SURVEY §5) against this engine's connectors."""

from __future__ import annotations

import json

import pytest

from d2b_dataframework_spark.core.errors import SchemaValidationError
from d2b_dataframework_spark.sources.connectors import (
    alodesk,
    facebook_marketing,
    facebook_organic,
    ga4,
    hubspot,
    instagram_organic,
    linkedin_marketing,
    linkedin_organic,
    search_console,
    sheets,
    shopify,
    tiktok,
    x_ads,
    youtube,
)
from d2b_dataframework_spark.sources.rest import FakeTransport
from d2b_dataframework_spark.sources.retry import AsyncJobPoller, RetryPolicy

# fake-transport payload flattening uses ANSI-safe try_* exprs; expression-level ANSI coverage lives in test_functions
pytestmark = pytest.mark.single_leg

NO_SLEEP = lambda _: None  # noqa: E731


def fast_policy(**kw):
    return RetryPolicy(sleep=NO_SLEEP, **kw)


# ---------------------------------------------------------------------------
# GA4
# ---------------------------------------------------------------------------

GA4_QUERY = {
    "requests": [
        {
            "dimensions": [{"name": "date"}, {"name": "city"}],
            "metrics": [{"name": "sessions"}],
            "dateRanges": [{"startDate": "2024-01-01", "endDate": "2024-01-02"}],
        }
    ]
}


def _ga4_payload(day, city, sessions, sampled=False):
    p = {
        "dimensionHeaders": [{"name": "date"}, {"name": "city"}],
        "metricHeaders": [{"name": "sessions"}],
        "rows": [
            {
                "dimensionValues": [{"value": day}, {"value": city}],
                "metricValues": [{"value": str(sessions)}],
            }
        ],
    }
    if sampled:
        p["metadata"] = {
            "samplesReadCounts": ["500"],
            "samplingSpaceSizes": ["1000"],
        }
        p["samplesReadCounts"] = ["500"]
        p["samplingSpaceSizes"] = ["1000"]
    return p


def test_ga4_flatten_and_sampling():
    payload = _ga4_payload("20240101", "Santiago", 150, sampled=True)
    rows = ga4.flatten_report(payload, sampling=True)
    assert rows == [
        {
            "date": "20240101",
            "city": "Santiago",
            "sessions": "150",
            "samplesReadCounts": 500,
            "samplingSpaceSizes": 1000,
            "sampling_percentage": 50.0,
            "sampled": True,
            "dataLossFromOtherRow": False,
        }
    ]


def test_ga4_daily_fanout(spark):
    t = FakeTransport()
    for day, city in [("2024-01-01", "Santiago"), ("2024-01-02", "Lima")]:
        q = ga4.daily_query(GA4_QUERY, day)
        body = dict(q["requests"][0])
        body["offset"] = 0
        body["limit"] = ga4.PAGE_SIZE
        t.responses[FakeTransport.key("properties/p1:batchRunReports", body)] = (
            _ga4_payload(day.replace("-", ""), city, 100)
        )
    df = ga4.read_report(spark, t, "p1", GA4_QUERY)
    rows = {r["city"]: r["date"] for r in df.collect()}
    assert rows == {"Santiago": "20240101", "Lima": "20240102"}
    assert df.columns == ["date", "city", "sessions"]


def test_ga4_realtime_report_single_call(spark):
    """Realtime branch: one runRealtimeReport call, no date split, no
    pagination, same string-typed header/row contract."""
    rt_query = {
        "dimensions": [{"name": "city"}],
        "metrics": [{"name": "activeUsers"}],
        "minuteRanges": [{"startMinutesAgo": 29}],
    }
    t = FakeTransport()
    t.responses[FakeTransport.key("properties/p1:runRealtimeReport", rt_query)] = {
        "dimensionHeaders": [{"name": "city"}],
        "metricHeaders": [{"name": "activeUsers"}],
        "rows": [
            {"dimensionValues": [{"value": "Santiago"}],
             "metricValues": [{"value": "42"}]},
        ],
    }
    df = ga4.read_realtime_report(spark, t, "p1", rt_query)
    assert df.columns == ["city", "activeUsers"]
    assert [(r["city"], r["activeUsers"]) for r in df.collect()] == [("Santiago", "42")]
    assert len(t.calls) == 1  # single call: no day fan-out, no offset loop


def test_ga4_offset_pagination_within_day(spark):
    # Page size 2: first page full (2 rows) → second page short (1 row).
    q = ga4.daily_query(GA4_QUERY, "2024-01-01")
    base = dict(q["requests"][0])
    t = FakeTransport()
    p1 = {
        "dimensionHeaders": [{"name": "date"}, {"name": "city"}],
        "metricHeaders": [{"name": "sessions"}],
        "rows": [
            {"dimensionValues": [{"value": "20240101"}, {"value": f"c{i}"}],
             "metricValues": [{"value": "1"}]}
            for i in range(2)
        ],
    }
    p2 = {
        "dimensionHeaders": p1["dimensionHeaders"],
        "metricHeaders": p1["metricHeaders"],
        "rows": p1["rows"][:1],
    }
    for offset, payload in [(0, p1), (2, p2)]:
        body = dict(base)
        body["offset"] = offset
        body["limit"] = 2
        t.responses[FakeTransport.key("properties/p1:batchRunReports", body)] = payload
    rows = ga4._fetch_day(t, "p1", GA4_QUERY, "2024-01-01", False, 2, fast_policy())
    assert len(rows) == 3


# ---------------------------------------------------------------------------
# Search Console
# ---------------------------------------------------------------------------


def test_gsc_auto_date_dim_and_defaults(spark):
    dims = search_console.with_date_dimension(["page"])
    assert dims == ["page", "date"]
    body = search_console.create_query("2024-01-01", "2024-01-02", dims, row_limit=2)
    t = FakeTransport()
    t.responses[FakeTransport.key("sc-domain:example.com", body)] = {
        "rows": [
            {"keys": ["/a", "2024-01-01"], "clicks": 5, "impressions": 100,
             "ctr": 0.05, "position": 3.2},
            {"keys": ["/b", "2024-01-01"]},  # metrics absent → 0 defaults
        ]
    }
    # page 1 was full (== row_limit) → a second page is requested; empty it.
    body2 = search_console.create_query(
        "2024-01-01", "2024-01-02", dims, row_limit=2, start_row=2
    )
    t.responses[FakeTransport.key("sc-domain:example.com", body2)] = {}
    df = search_console.read_report(
        spark, t, "sc-domain:example.com", "2024-01-01", "2024-01-02",
        ["page"], row_limit=2, policy=fast_policy(),
    )
    # page 1 was full (2 rows) → a second page is requested; make it empty.
    rows = sorted(df.collect(), key=lambda r: r["page"])
    assert [r["clicks"] for r in rows] == [5, 0]
    assert [r["position"] for r in rows] == [3.2, 0.0]
    assert df.columns == ["page", "date", "clicks", "impressions", "ctr", "position"]


def test_gsc_empty_result_keeps_schema(spark):
    body = search_console.create_query("2024-01-01", "2024-01-01", ["page", "date"])
    t = FakeTransport()
    t.responses[FakeTransport.key("uri", body)] = {}
    df = search_console.read_report(
        spark, t, "uri", "2024-01-01", "2024-01-01", ["page"], policy=fast_policy()
    )
    assert df.count() == 0
    assert df.columns == ["page", "date", "clicks", "impressions", "ctr", "position"]


def test_gsc_startrow_pagination():
    dims = ["page", "date"]
    t = FakeTransport()
    full = {"rows": [{"keys": [f"/p{i}", "2024-01-01"], "clicks": i} for i in range(3)]}
    short = {"rows": [{"keys": ["/last", "2024-01-01"], "clicks": 9}]}
    for start_row, payload in [(0, full), (3, short)]:
        body = search_console.create_query(
            "2024-01-01", "2024-01-01", dims, row_limit=3, start_row=start_row
        )
        t.responses[FakeTransport.key("uri", body)] = payload
    rows = search_console._fetch_window(
        t, "uri", "2024-01-01", "2024-01-01", dims, None, "web", "final", 3,
        fast_policy(),
    )
    assert len(rows) == 4 and rows[-1]["page"] == "/last"


# ---------------------------------------------------------------------------
# Facebook Marketing (async job + actions)
# ---------------------------------------------------------------------------


def _fb_transport(records):
    t = FakeTransport()
    t.responses[FakeTransport.key("act_1/insights", {"level": "ad"})] = {
        "report_run_id": "job9"
    }
    t.responses[FakeTransport.key("job9", None)] = {"async_status": "Job Completed"}
    t.responses[FakeTransport.key("job9/insights", None)] = {"data": records}
    return t


def test_fb_async_job_and_schema(spark):
    recs = [
        {"impressions": "100", "clicks": "3", "date_start": "2024-01-01",
         "date_stop": "2024-01-01", "account_id": "act_1"}
    ]
    poller = AsyncJobPoller(sleep=NO_SLEEP)
    df = facebook_marketing.read_report(
        spark, _fb_transport(recs), "act_1", {"level": "ad"},
        fields=["impressions", "clicks"], poller=poller,
    )
    assert df.columns == ["impressions", "clicks", "date_start", "date_stop", "account_id"]
    assert df.collect()[0]["impressions"] == "100"


def test_fb_job_failure_raises(spark):
    t = _fb_transport([])
    t.responses[FakeTransport.key("job9", None)] = {"async_status": "Job Failed"}
    from d2b_dataframework_spark.core.errors import AsyncJobFailedError

    with pytest.raises(AsyncJobFailedError):
        facebook_marketing.fetch_async_report(
            t, "act_1", {"level": "ad"}, AsyncJobPoller(sleep=NO_SLEEP)
        )


def test_fb_action_expansion(spark):
    df = spark.createDataFrame(
        [
            ("r1", [("link_click", "5"), ("purchase", "2")]),
            ("r2", [("link_click", "7")]),
            ("r3", None),
        ],
        "id string, actions array<struct<action_type:string,value:string>>",
    )
    types = facebook_marketing.distinct_action_types(df)
    assert types == ["link_click", "purchase"]
    out = facebook_marketing.expand_actions(df, action_types=types)
    rows = {r["id"]: (r["_action_link_click"], r["_action_purchase"]) for r in out.collect()}
    assert rows == {"r1": ("5", "2"), "r2": ("7", "0"), "r3": ("0", "0")}


def test_fb_multi_account_fanout(spark):
    t = FakeTransport()
    for acc in ["act_1", "act_2"]:
        t.responses[FakeTransport.key(f"{acc}/insights", {})] = {"report_run_id": f"j_{acc}"}
        t.responses[FakeTransport.key(f"j_{acc}", None)] = {"async_status": "Job Completed"}
        t.responses[FakeTransport.key(f"j_{acc}/insights", None)] = {
            "data": [{"impressions": "10", "date_start": "d", "date_stop": "d",
                      "account_id": acc}]
        }
    df = facebook_marketing.read_report_accounts(
        spark, t, ["act_1", "act_2"], {}, fields=["impressions"],
        poller=AsyncJobPoller(sleep=NO_SLEEP, initial_wait=0),
    )
    assert sorted(r["account_id"] for r in df.collect()) == ["act_1", "act_2"]


# ---------------------------------------------------------------------------
# Facebook organic + Instagram
# ---------------------------------------------------------------------------


def test_fb_organic_cursor_walk_and_normalization(spark):
    t = FakeTransport()
    page1 = {
        "data": [
            {"id": "p1", "message": "hello", "created_time": "2024-01-01T00:00:00+0000",
             "shares": {"count": 3},
             "comments": {"summary": {"total_count": 7}},
             "reactions": {"summary": {"total_count": 11}}},
        ],
        "paging": {"cursors": {"after": "c2"}, "next": "url"},
    }
    page2 = {
        "data": [{"id": "p2"}],  # everything absent → 0s
        "paging": {"cursors": {}},
    }
    t.responses[FakeTransport.key("pg/posts", {"fields": facebook_organic.POST_FIELDS})] = page1
    t.responses[
        FakeTransport.key("pg/posts", {"fields": facebook_organic.POST_FIELDS, "after": "c2"})
    ] = page2
    df = facebook_organic.read_posts(spark, t, "pg", policy=fast_policy())
    rows = {r["post_id"]: r for r in df.collect()}
    assert rows["p1"]["shares"] == 3 and rows["p1"]["comments"] == 7
    assert rows["p2"]["shares"] == 0 and rows["p2"]["reactions"] == 0


def test_fb_organic_insights_tolerated_failure(spark):
    t = FakeTransport()
    t.responses[
        FakeTransport.key("p1/insights", {"metric": "post_impressions", "period": "lifetime"})
    ] = {"data": [{"name": "post_impressions",
                   "values": [{"period": "lifetime", "value": 42}]}]}
    # p2 has no fixture → fetch fails → null metrics, row survives (R6)
    df = facebook_organic.read_post_insights(spark, t, ["p1", "p2"], ["post_impressions"])
    rows = {r["post_id"]: r["post_impressions"] for r in df.collect()}
    assert rows == {"p1": 42, "p2": None}


def test_fb_reactions_map_expansion(spark):
    df = spark.createDataFrame(
        [("p1", {"like": "4", "love": "2"}), ("p2", None)],
        "post_id string, reactions_by_type map<string,string>",
    )
    out = facebook_organic.expand_reactions(df, "reactions_by_type", ["like", "love", "wow"])
    rows = {r["post_id"]: (r["reactions_like"], r["reactions_love"], r["reactions_wow"])
            for r in out.collect()}
    assert rows == {"p1": (4, 2, 0), "p2": (0, 0, 0)}


def test_instagram_media_filter_and_stories_union(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key(
        "ig1/media", {"fields": instagram_organic.MEDIA_FIELDS}
    )] = {
        "data": [
            {"id": "m1", "media_type": "IMAGE", "media_product_type": "FEED"},
            {"id": "m2", "media_type": "VIDEO", "media_product_type": "REELS"},
        ],
        "paging": {},
    }
    t.responses[FakeTransport.key(
        "ig1/stories", {"fields": instagram_organic.MEDIA_FIELDS}
    )] = {"data": [{"id": "s1", "media_type": "IMAGE"}], "paging": {}}
    feed = instagram_organic.read_media(spark, t, "ig1", media_product_type="FEED")
    assert [r["media_id"] for r in feed.collect()] == ["m1"]
    stories = instagram_organic.read_stories(spark, t, "ig1")
    assert stories.collect()[0]["media_product_type"] == "STORY"
    all_media = instagram_organic.read_media(spark, t, "ig1").unionByName(stories)
    assert all_media.count() == 3


# ---------------------------------------------------------------------------
# LinkedIn organic
# ---------------------------------------------------------------------------


def _li_posts_transport(n_pages=2):
    """Newest-first posts: page0 has fresh posts, page1 has one older than
    the window (early stop)."""
    t = FakeTransport()
    fresh = [
        {"id": f"urn:li:share:{i}", "createdAt": 1704153600000 - i * 1000,
         "commentary": f"post {i}", "lifecycleState": "PUBLISHED"}
        for i in range(2)
    ]
    old = [{"id": "urn:li:share:old", "createdAt": 1600000000000}]
    t.responses[FakeTransport.key(
        "posts", {"q": "author", "author": "urn:li:organization:1", "start": 0, "count": 2}
    )] = {"elements": fresh}
    t.responses[FakeTransport.key(
        "posts", {"q": "author", "author": "urn:li:organization:1", "start": 2, "count": 2}
    )] = {"elements": old}
    return t


def test_linkedin_posts_early_stop(spark):
    t = _li_posts_transport()
    df = linkedin_organic.read_posts(
        spark, t, "urn:li:organization:1", "2024-01-01", "2024-01-02",
        page_size=2, policy=fast_policy(retry_codes=frozenset()),
    )
    rows = df.collect()
    assert len(rows) == 2  # the old post stopped the walk and was excluded
    assert all(r["created_at"].startswith(("2024-01-01", "2024-01-02")) for r in rows)
    assert rows[0]["content_type"] == "NONE"


def test_linkedin_content_type_and_urn():
    assert linkedin_organic.derive_content_type({"article": {}}) == "ARTICLE"
    assert linkedin_organic.derive_content_type({"media": {}}) == "MEDIA"
    assert linkedin_organic.derive_content_type({"multiImage": {}}) == "MULTI_IMAGE"
    assert linkedin_organic.derive_content_type(None) == "NONE"
    assert linkedin_organic.urn_tail("urn:li:organization:123") == "123"


def test_linkedin_engagement_join_fill_zero(spark):
    posts = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"), ("u2", "2024-01-01 01:00:00")],
        "post_urn string, created_at string",
    )
    t = FakeTransport()
    t.responses[FakeTransport.key("socialActions/u1", None)] = {
        "likesSummary": {"totalLikes": 5},
        "commentsSummary": {"aggregatedTotalComments": 2},
        "sharesSummary": {"totalShares": 1},
    }
    t.responses[FakeTransport.key("socialActions/u2", None)] = {}
    out = linkedin_organic.posts_with_engagement(
        spark, t, posts, policy=fast_policy(retry_codes=frozenset())
    )
    rows = {r["post_urn"]: (r["likes"], r["comments"], r["shares"]) for r in out.collect()}
    assert rows == {"u1": (5, 2, 1), "u2": (0, 0, 0)}


def test_linkedin_quota_degradation(spark):
    """429 mid-enrichment → posts come back without engagement (R9)."""
    posts = spark.createDataFrame([("u1", "x")], "post_urn string, created_at string")
    t = FakeTransport()
    t.failures = [(1, 429)]
    out = linkedin_organic.posts_with_engagement(
        spark, t, posts,
        policy=RetryPolicy(sleep=NO_SLEEP, retry_codes=frozenset({500}),
                           abort_codes=frozenset({429})),
    )
    assert out.columns == ["post_urn", "created_at"]


def test_linkedin_orgs_scan(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key("organizationAcls", {"q": "roleAssignee"})] = {
        "elements": [
            {"organization": "urn:li:organization:77", "role": "ADMINISTRATOR",
             "state": "APPROVED"}
        ]
    }
    df = linkedin_organic.read_managed_orgs(spark, t, policy=fast_policy())
    row = df.collect()[0]
    assert row["organization_id"] == "77" and row["role"] == "ADMINISTRATOR"


# ---------------------------------------------------------------------------
# LinkedIn Marketing
# ---------------------------------------------------------------------------


def test_linkedin_marketing_report_and_name_join(spark):
    t = FakeTransport()
    for day in ["2024-01-01", "2024-01-02"]:
        t.responses[FakeTransport.key(
            "adAnalytics",
            {"q": "analytics", "account": "a1",
             "dateRange.start": day, "dateRange.end": day},
        )] = {"elements": [{"campaign_id": "c9", "impressions": 10, "clicks": 1,
                            "cost": "1.5", "adentities": [{"x": 1}]}]}
    df = linkedin_marketing.read_report(
        spark, t, "a1", "2024-01-01", "2024-01-02",
        policy=fast_policy(retry_codes=frozenset()),
    )
    assert df.count() == 2
    assert json.loads(df.collect()[0]["adentities"]) == [{"x": 1}]

    t.responses[FakeTransport.key("adCampaigns", {"ids": "c9"})] = {
        "results": {"c9": {"name": "Brand"}}
    }
    name_map = linkedin_marketing.fetch_name_map(
        t, ["c9"], policy=fast_policy(retry_codes=frozenset())
    )
    out = linkedin_marketing.with_names(spark, df, name_map)
    assert out.collect()[0]["campaign_name"] == "Brand"


# ---------------------------------------------------------------------------
# TikTok
# ---------------------------------------------------------------------------


def test_tiktok_leaf_names_collision_aware():
    rename = tiktok.leaf_names(["dimensions.ad_id", "metrics.spend", "metrics.clicks"])
    assert rename == {
        "dimensions.ad_id": "ad_id", "metrics.spend": "spend",
        "metrics.clicks": "clicks",
    }
    collide = tiktok.leaf_names(["a.value", "b.value"])
    assert collide["a.value"] == "value" and collide["b.value"] == "b_value"


def test_tiktok_windowed_scan(spark):
    dims, mets = ["stat_time_day", "ad_id"], ["spend"]

    t = FakeTransport()

    def resp(start, end, page, rows, total):
        body = {
            "advertiser_id": "adv", "start_date": start, "end_date": end,
            "dimensions": dims, "metrics": mets, "data_level": "AUCTION_AD",
            "page": page, "page_size": 2,
        }
        t.responses[FakeTransport.key("report/integrated/get", body)] = {
            "code": 0,
            "data": {"list": rows, "page_info": {"total_page": total}},
        }

    def rec(day, ad, spend):
        return {"dimensions": {"stat_time_day": day, "ad_id": ad},
                "metrics": {"spend": spend}}

    # 35-day range → two windows: [01-01..01-30], [01-31..02-04]
    resp("2024-01-01", "2024-01-30", 1, [rec("2024-01-02", "a1", "1.0"),
                                         rec("2024-01-01", "a1", "2.0")], 2)
    resp("2024-01-01", "2024-01-30", 2, [rec("2024-01-03", "a2", "3.0")], 2)
    resp("2024-01-31", "2024-02-04", 1, [rec("2024-02-01", "a1", "4.0")], 1)

    df = tiktok.read_report(
        spark, t, "adv", "2024-01-01", "2024-02-04", dims, mets, page_size=2,
        policy=fast_policy(retry_codes=frozenset()),
    )
    rows = df.collect()
    assert [r["stat_time_day"] for r in rows] == sorted(r["stat_time_day"] for r in rows)
    assert len(rows) == 4
    assert df.columns == ["stat_time_day", "ad_id", "spend"]


def test_tiktok_error_code_raises(spark):
    t = FakeTransport()
    body = {
        "advertiser_id": "adv", "start_date": "2024-01-01", "end_date": "2024-01-01",
        "dimensions": ["stat_time_day"], "metrics": ["spend"],
        "data_level": "AUCTION_AD", "page": 1, "page_size": 1000,
    }
    t.responses[FakeTransport.key("report/integrated/get", body)] = {
        "code": 40001, "message": "bad request"
    }
    with pytest.raises(Exception, match="40001"):
        tiktok._fetch_window(
            t, "adv", "2024-01-01", "2024-01-01", ["stat_time_day"], ["spend"],
            "AUCTION_AD", 1000, fast_policy(retry_codes=frozenset()),
        )


# ---------------------------------------------------------------------------
# X Ads
# ---------------------------------------------------------------------------


def test_x_ads_grid_fanout_and_summary_join(spark):
    t = FakeTransport()
    for day in ["2024-01-01", "2024-01-02"]:
        t.responses[FakeTransport.key(
            "stats/accounts/acc",
            {"entity": "CAMPAIGN", "entity_ids": "c1", "metric_groups": "ENGAGEMENT",
             "start_time": day, "granularity": "DAY"},
        )] = {
            "data": [
                {"id": "c1", "id_data": [
                    {"placement": "ALL_ON_TWITTER",
                     "metrics": {"engagements": [3, None], "impressions": [100]}}
                ]}
            ]
        }
    stats = x_ads.read_stats(
        spark, t, "acc", ["c1"], ["ENGAGEMENT"], "2024-01-01", "2024-01-02"
    )
    assert stats.count() == 2
    assert stats.collect()[0]["metrics_engagements"] == 3

    t.responses[FakeTransport.key("accounts/acc/campaigns", None)] = {
        "data": [{"id": "c1", "name": "Launch", "currency": "USD",
                  "created_at": "2023-12-01"}]
    }
    summary = x_ads.read_account_summary(spark, t, "acc")
    out = x_ads.stats_with_summary(stats, summary)
    assert all(r["name"] == "Launch" for r in out.collect())


# ---------------------------------------------------------------------------
# Shopify
# ---------------------------------------------------------------------------

ORDER = {
    "id": 1001, "order_number": 77, "created_at": "2024-01-05T10:00:00-03:00",
    "email": "a@b.c", "currency": "CLP", "financial_status": "paid",
    "total_price": "119.0", "subtotal_price": "100.0",
    "total_discounts": "10.0", "total_tax": "19.0",
    "total_shipping_price_set": {"shop_money": {"amount": "5.5"}},
    "refunds": [
        {
            "refund_line_items": [{"subtotal": 20.0, "total_tax": 3.8}],
            "order_adjustments": [{"amount": -2.5, "kind": "shipping_refund"}],
        }
    ],
}


def test_shopify_link_walk_and_financials(spark):
    t = FakeTransport()
    params = {
        "created_at_min": "2024-01-01", "created_at_max": "2024-01-31",
        "status": "any", "limit": 250, "order": "created_at asc",
    }
    t.responses[FakeTransport.key("orders.json", params)] = {
        "orders": [ORDER], "link_next": "page2",
    }
    t.responses[FakeTransport.key("page2", None)] = {
        "orders": [{**ORDER, "id": 1002, "refunds": []}]
    }
    df = shopify.read_orders(spark, t, "2024-01-01", "2024-01-31")
    rows = {r["order_id"]: r for r in df.collect()}
    assert len(rows) == 2
    r = rows[1001]
    # returns = 20.0 + 3.8; shipping = 5.5 - |-2.5|
    assert r["returns"] == pytest.approx(23.8)
    assert r["shipping_charges"] == pytest.approx(3.0)
    assert r["gross_sales"] == pytest.approx(110.0)
    # net = gross - discounts - returns = 110 - 10 - 23.8
    assert r["net_sales"] == pytest.approx(76.2)
    # total = net + shipping + duties + fees + taxes = 76.2 + 3 + 0 + 0 + 19
    assert r["total_sales"] == pytest.approx(98.2)
    assert r["custom_total_sales"] == pytest.approx(98.2 - 23.8)
    # no-refund order: returns 0, shipping uncut
    assert rows[1002]["returns"] == 0.0 and rows[1002]["shipping_charges"] == 5.5


def test_shopify_refunds_filter(spark):
    t = FakeTransport()
    params = {
        "updated_at_min": "2024-01-01", "updated_at_max": "2024-01-31",
        "financial_status": "refunded", "status": "any", "limit": 250,
    }
    t.responses[FakeTransport.key("orders.json", params)] = {
        "orders": [ORDER, {**ORDER, "id": 1003, "refunds": []}]
    }
    df = shopify.read_refunds(spark, t, "2024-01-01", "2024-01-31")
    assert [r["order_id"] for r in df.collect()] == [1001]  # P11 filter


# ---------------------------------------------------------------------------
# HubSpot / Alodesk
# ---------------------------------------------------------------------------


def test_hubspot_properties_flatten(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key("crm/v3/objects/contacts", {"limit": 10})] = {
        "results": [
            {"id": 1, "createdAt": "2024-01-01", "archived": False,
             "properties": {"email": "x@y.z", "firstname": "Ana"}},
            {"id": 2, "properties": {"lastname": "Soto"}},
        ]
    }
    df = hubspot.read_objects(spark, t, "contacts", {"limit": 10})
    assert df.columns == [
        "hs_object_id", "createdAt", "updatedAt", "archived",
        "email", "firstname", "lastname",
    ]
    rows = {r["hs_object_id"]: r for r in df.collect()}
    assert rows["1"]["email"] == "x@y.z" and rows["2"]["lastname"] == "Soto"
    assert rows["2"]["email"] is None


def test_hubspot_error_returns_empty():
    assert hubspot.call_api(FakeTransport(), "GET", "nope") == {}


def test_alodesk_dual_shape_and_dedup(spark):
    t = FakeTransport()
    page1 = {
        "results": [
            {"id": 1, "updated_at": "2024-01-01 10:00:00", "name": "a", "status": "new"},
            {"id": 1, "updated_at": "2024-01-02 10:00:00", "name": "a", "status": "won"},
        ],
        "next": "p2",
    }
    page2 = [  # bare-list shape
        {"id": 2, "updated_at": "not-a-date", "name": "b", "status": "open"},
        {"id": 2, "updated_at": "2024-01-03 09:00:00", "name": "b", "status": "lost"},
    ]
    t.responses[FakeTransport.key(
        "api/leads/report/", {"startDate": "2024-01-01", "endDate": "2024-01-31", "page": 1}
    )] = page1
    t.responses[FakeTransport.key(
        "api/leads/report/", {"startDate": "2024-01-01", "endDate": "2024-01-31", "page": 2}
    )] = page2
    df = alodesk.read_leads(
        spark, t, "2024-01-01", "2024-01-31",
        policy=fast_policy(retry_codes=frozenset()),
    )
    rows = {r["lead_id"]: r["status"] for r in df.collect()}
    assert rows == {"1": "won", "2": "lost"}  # keep-latest; invalid ts loses


# ---------------------------------------------------------------------------
# YouTube
# ---------------------------------------------------------------------------


def test_youtube_channel_to_videos_chain(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key(
        "channels", {"part": "snippet,statistics,contentDetails", "id": "ch1"}
    )] = {"items": [{"id": "ch1", "snippet": {"title": "Chan"},
                     "contentDetails": {"relatedPlaylists": {"uploads": "pl1"}},
                     "statistics": {"subscriberCount": "10", "videoCount": "2"}}]}
    t.responses[FakeTransport.key(
        "playlistItems", {"playlistId": "pl1", "part": "contentDetails", "maxResults": 50}
    )] = {"items": [{"contentDetails": {"videoId": "v1"}},
                    {"contentDetails": {"videoId": "v2"}}]}
    t.responses[FakeTransport.key("videos", {"id": "v1,v2", "part": "snippet,statistics"})] = {
        "items": [
            {"id": "v1", "snippet": {"title": "A", "publishedAt": "2024-01-01T00:00:00Z"},
             "statistics": {"viewCount": "100", "likeCount": "5"}},
            {"id": "v2", "snippet": {"title": "B"},
             "statistics": {"viewCount": "bad-number"}},  # F9 coerce → null
        ]
    }
    df = youtube.read_channel_videos(spark, t, "ch1")
    rows = {r["id"]: r for r in df.collect()}
    assert rows["v1"]["statistics_viewCount"] == 100
    assert rows["v2"]["statistics_viewCount"] is None


def test_youtube_column_validation():
    with pytest.raises(SchemaValidationError, match="unknown columns"):
        youtube.validate_columns(["nope"], ["id", "snippet_title"])


def test_youtube_comments_disabled_skip(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key(
        "commentThreads", {"videoId": "v1", "part": "snippet", "maxResults": 100}
    )] = {
        "items": [{"snippet": {"totalReplyCount": 1, "topLevelComment": {"snippet": {
            "publishedAt": "2024-01-01T00:00:00Z", "textDisplay": "hi", "likeCount": 2}}}}]
    }

    # v2 → 403 commentsDisabled (no fixture, but scripted failure text)
    class DisabledTransport(FakeTransport):
        def get(self, endpoint, params=None):
            if params and params.get("videoId") == "v2":
                from d2b_dataframework_spark.sources.rest import TransportError

                raise TransportError("commentsDisabled for v2", status_code=403)
            return super().get(endpoint, params)

    t2 = DisabledTransport(responses=t.responses)
    df = youtube.read_video_comments(spark, t2, ["v1", "v2"])
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["video_id"] == "v1"


# ---------------------------------------------------------------------------
# Sheets
# ---------------------------------------------------------------------------


def test_sheets_read_header_and_ragged_rows(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key("spreadsheets/s1/values/A1:C3", None)] = {
        "values": [["name", "score", "day"], ["ana", "10"], ["bob", "20", "2024-01-01", "extra"]]
    }
    df = sheets.read_range(spark, t, "s1", "A1:C3")
    assert df.columns == ["name", "score", "day"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["ana"]["day"] is None and rows["bob"]["day"] == "2024-01-01"


def test_sheets_update_and_append(spark):
    t = FakeTransport()
    df = spark.createDataFrame([("ana", 10)], "name string, score int")
    sheets.update_range(t, df, "s1", "A1")
    sheets.append_range(t, df, "s1", "A1")
    update_call, append_call = t.calls[-2], t.calls[-1]
    assert update_call[1]["values"] == [["name", "score"], ["ana", "10"]]
    assert append_call[1]["values"] == [["ana", "10"]]  # no header on append


def test_sheets_delete_validation():
    with pytest.raises(ValueError):
        sheets.delete_range(FakeTransport(), "s1", 0, dimension="DIAGONAL")
