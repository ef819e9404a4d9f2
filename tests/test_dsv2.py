"""DSv2 GSC source: planner-visible filter pushdown into the HTTP
request body (SURVEY §7.4; reference request builder
d2b_data/search_console.py:219-260)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

# planner/pushdown mechanics, not ANSI expression semantics
pytestmark = pytest.mark.single_leg

ECHO = "d2b_dataframework_spark.sources.dsv2.testing:EchoTransport"


@pytest.fixture(scope="module")
def gsc(spark):
    from d2b_dataframework_spark.sources.dsv2 import register

    register(spark)
    return (
        spark.read.format("gsc_rest")
        .option("site", "https://example.com/")
        .option("dimensions", "query,country")
        .option("transport", ECHO)
    )


def test_date_range_pushdown_reaches_http_request(gsc):
    df = gsc.load().filter(
        (F.col("date") >= "2025-03-01") & (F.col("date") <= "2025-03-03")
    )
    rows = df.collect()
    # one partition per day in the PUSHED range — 3 days, not the
    # default multi-year window
    days = sorted(r["date"] for r in rows)
    assert days == ["2025-03-01", "2025-03-02", "2025-03-03"]
    for r in rows:
        body = json.loads(r["query"])
        # each day-partition's HTTP request is narrowed to its own day
        assert body["startDate"] == body["endDate"] == r["date"]
        assert body["rowLimit"] == 25000 and body["searchType"] == "web"
    # absorbed predicates are NOT re-applied post-scan: no Filter node
    # at all (the scan's "RuntimeFilters: []" label is not a node)
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter\b", plan)


def test_dimension_equality_pushdown_builds_filter_groups(gsc):
    df = gsc.load().filter(
        (F.col("date") == "2025-04-01") & (F.col("country") == "usa")
    )
    rows = df.collect()
    assert len(rows) == 1
    body = json.loads(rows[0]["query"])
    assert body["dimensionFilterGroups"] == [
        {
            "groupType": "and",
            "filters": [
                {"dimension": "country", "operator": "equals", "expression": "usa"}
            ],
        }
    ]
    # the echo row's country is "echo", not "usa": it survived because
    # Catalyst removed the absorbed predicate — proof the filter was
    # handled in the request, not post-scan
    assert rows[0]["country"] == "echo"


def test_unsupported_predicates_stay_post_scan(gsc):
    # clicks > 0 is not API-expressible: it must be returned to Spark
    # and evaluated post-scan (correctness never trusts the API beyond
    # what pushFilters absorbed)
    df = gsc.load().filter(
        (F.col("date") == "2025-04-02") & (F.col("clicks") > 100)
    )
    assert df.collect() == []  # echo emits clicks=1 -> filtered post-scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "clicks" in plan.split("Scan")[0]  # Filter(clicks) above the scan


def test_contradictory_date_pushdown_yields_empty(gsc):
    df = gsc.load().filter(
        (F.col("date") >= "2025-05-02") & (F.col("date") <= "2025-05-01")
    )
    assert df.collect() == []


def test_startrow_pagination_loops_until_short_page(spark):
    from d2b_dataframework_spark.sources.dsv2 import register

    register(spark)
    df = (
        spark.read.format("gsc_rest")
        .option("site", "https://example.com/")
        .option("dimensions", "query")
        .option("transport", ECHO)
        .option("rowLimit", 3)
        .option("echo_total_rows", 8)  # pages of 3,3,2 -> loop 3 times
        .load()
        .filter(F.col("date") == "2025-06-01")
    )
    rows = df.collect()
    assert sorted(r["clicks"] for r in rows) == list(range(1, 9))
    start_rows = sorted({json.loads(r["query"])["startRow"] for r in rows})
    assert start_rows == [0, 3, 6]


def test_empty_result_yields_typed_empty_frame(spark):
    from d2b_dataframework_spark.sources.dsv2 import register

    register(spark)
    df = (
        spark.read.format("gsc_rest")
        .option("site", "https://example.com/")
        .option("transport", "d2b_dataframework_spark.sources.dsv2.testing:EmptyTransport")
        .load()
        .filter(F.col("date") == "2025-06-01")
    )
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == [
        "query", "date", "clicks", "impressions", "ctr", "position",
    ]


REC = "d2b_dataframework_spark.sources.dsv2.testing:RecordingSheetsTransport"


def _read_spool(spool):
    import glob

    out = []
    for p in glob.glob(f"{spool}/*.jsonl"):
        with open(p) as fh:
            out.extend(json.loads(line) for line in fh)
    return out


def test_sheets_writer_batches_appends_and_commits(spark, tmp_path):
    from d2b_dataframework_spark.sources.dsv2 import sheets

    sheets.register(spark)
    spool = str(tmp_path / "spool")
    import os

    os.makedirs(spool)
    df = spark.range(0, 25).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).repartition(2)
    (
        df.write.format("sheets_rest")
        .option("spreadsheet", "sheet-1")
        .option("range", "Data!A1")
        .option("transport", REC)
        .option("spool", spool)
        .option("batchRows", 10)
        .mode("append")
        .save()
    )
    log = _read_spool(spool)
    appends = [r for r in log if r["op"] == "append"]
    completes = [r for r in log if r["op"] == "complete"]
    assert sum(r["n"] for r in appends) == 25
    assert all(r["n"] <= 10 for r in appends)  # batch cap honored
    assert len(completes) == 1
    assert completes[0]["n_rows"] == 25
    assert completes[0]["n_requests"] == len(appends)
    # row payloads round-trip in schema column order
    all_rows = sorted(tuple(v) for r in appends for v in r["values"])
    assert all_rows == sorted((i, i * 10) for i in range(25))
    assert not [r for r in log if r["op"] == "clear"]  # append mode


def test_sheets_writer_overwrite_clears_once_before_tasks(spark, tmp_path):
    from d2b_dataframework_spark.sources.dsv2 import sheets

    sheets.register(spark)
    spool = str(tmp_path / "spool2")
    import os

    os.makedirs(spool)
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    (
        df.write.format("sheets_rest")
        .option("spreadsheet", "sheet-1")
        .option("range", "Data!A1")
        .option("transport", REC)
        .option("spool", spool)
        .mode("overwrite")
        .save()
    )
    log = _read_spool(spool)
    assert len([r for r in log if r["op"] == "clear"]) == 1
    assert sum(r["n"] for r in log if r["op"] == "append") == 5


def test_sheets_writer_abort_marks_failure(spark, tmp_path):
    from d2b_dataframework_spark.sources.dsv2 import sheets

    sheets.register(spark)
    spool = str(tmp_path / "spool3")
    import os

    os.makedirs(spool)
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(Exception, match="simulated API failure"):
        (
            df.write.format("sheets_rest")
            .option("spreadsheet", "sheet-1")
            .option("range", "Data!A1")
            .option(
                "transport",
                "d2b_dataframework_spark.sources.dsv2.testing:FailingSheetsTransport",
            )
            .option("spool", spool)
            .mode("append")
            .save()
        )
    log = _read_spool(spool)
    assert [r for r in log if r["op"] == "failed"]
    assert not [r for r in log if r["op"] == "complete"]


POLL = "d2b_dataframework_spark.sources.dsv2.testing:DeterministicPollTransport"


def _realtime_reader(opts=None):
    from pyspark.sql.types import StructType

    from d2b_dataframework_spark.sources.dsv2.ga4_stream import (
        Ga4RealtimeStreamSource,
    )

    options = {"transport": POLL, "propertyid": "123", **(opts or {})}
    src = Ga4RealtimeStreamSource(options)
    return src, src.simpleStreamReader(src.schema())


def test_ga4_stream_offsets_advance_one_poll_per_batch():
    src, reader = _realtime_reader()
    assert reader.initialOffset() == {"poll": 0}
    rows0, nxt = reader.read({"poll": 0})
    assert nxt == {"poll": 1}
    rows0 = list(rows0)
    # seq 0 -> 0 % 3 + 1 = 1 row; schema = country, activeUsers, poll_seq
    assert rows0 == [("country-0-0", "0", "0")]
    rows2 = list(reader.read({"poll": 2})[0])
    assert len(rows2) == 2 % 3 + 1 and all(r[2] == "2" for r in rows2)


def test_ga4_stream_replay_is_deterministic():
    _, reader = _realtime_reader()
    live = [list(reader.read({"poll": s})[0]) for s in (0, 1, 2)]
    replayed = list(reader.readBetweenOffsets({"poll": 0}, {"poll": 3}))
    assert replayed == [r for batch in live for r in batch]


def test_ga4_stream_end_to_end_with_checkpoint_restart(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the second resumes at
    the NEXT poll (offset log), and commits are acked to the transport."""
    from d2b_dataframework_spark.sources.dsv2 import ga4_stream

    ga4_stream.register(spark)
    commit_log = tmp_path / "commits.log"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("ga4_realtime")
            .option("transport", POLL)
            .option("propertyid", "123")
            .option("dimensions", "country,city")
            .option("metrics", "activeUsers")
            .option("commit_log", str(commit_log))
            .load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    run_once()
    got = {
        (r["country"], r["city"], r["poll_seq"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # poll 0: 1 row, poll 1: 2 rows — distinct dim values per row index
    expect = {("country-0-0", "city-0-0", "0")} | {
        (f"country-1-{i}", f"city-1-{i}", "1") for i in range(2)
    }
    assert got == expect
    # The Simple-reader wrapper acks a batch's offset on the FOLLOWING
    # run (commit is deferred until the engine confirms the checkpoint):
    # two runs have therefore acked exactly batch 0's end offset.
    acked = [int(x) for x in commit_log.read_text().split()]
    assert acked == [1]


def test_register_all_registers_every_format(spark):
    from d2b_dataframework_spark.sources.dsv2 import register_all

    register_all(spark)
    # reading/writing through each format elsewhere in this module
    # proves behavior; here just assert registration is idempotent.
    register_all(spark)


# ---------------------------------------------------------------------------
# TikTok DSv2 reader: window + filtering pushdown (VERDICT r3 item #8;
# reference request params d2b_data/tiktok_marketing.py:284-296)
# ---------------------------------------------------------------------------

TIKTOK_ECHO = "d2b_dataframework_spark.sources.dsv2.testing:TikTokEchoTransport"


@pytest.fixture(scope="module")
def tiktok(spark):
    from d2b_dataframework_spark.sources.dsv2 import tiktok as tk

    tk.register(spark)
    return (
        spark.read.format("tiktok_rest")
        .option("advertiser_id", "adv-1")
        .option("dimensions", "stat_time_day,campaign_id")
        .option("metrics", "spend,impressions")
        .option("transport", TIKTOK_ECHO)
    )


def test_tiktok_date_pushdown_narrows_window_and_chunks(tiktok):
    """A 40-day pushed range fans out as two ≤30-day InputPartitions
    whose request bodies carry the narrowed window."""
    df = tiktok.load().filter(
        (F.col("stat_time_day") >= "2025-01-01")
        & (F.col("stat_time_day") <= "2025-02-09")
    )
    rows = df.collect()
    bodies = [json.loads(r["spend"]) for r in rows]
    windows = sorted({(b["start_date"], b["end_date"]) for b in bodies})
    assert windows == [
        ("2025-01-01", "2025-01-30"),
        ("2025-01-31", "2025-02-09"),
    ]
    for b in bodies:
        assert b["advertiser_id"] == "adv-1"
        assert b["data_level"] == "AUCTION_AD"
        assert "filtering" not in b
    # absorbed predicates are gone from the post-scan plan
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter\b", plan)


def test_tiktok_id_equality_pushdown_builds_filtering(tiktok):
    df = tiktok.load().filter(
        (F.col("stat_time_day") == "2025-03-05")
        & (F.col("campaign_id") == "c-77")
    )
    rows = df.collect()
    assert len(rows) == 1
    body = json.loads(rows[0]["spend"])
    assert body["start_date"] == body["end_date"] == "2025-03-05"
    assert body["filtering"] == [
        {"field_name": "campaign_id", "filter_type": "IN",
         "filter_value": ["c-77"]}
    ]
    # the echo row's campaign_id is "echo", not "c-77": it survived
    # because Catalyst removed the absorbed equality — proof it was
    # handled in the request, not post-scan (only the planner's
    # companion isnotnull may remain, as in the GSC dimension case)
    assert rows[0]["campaign_id"] == "echo"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "c-77" not in plan


def test_tiktok_unsupported_predicate_stays_post_scan(tiktok):
    """A metric predicate cannot be pushed into the report API — it must
    survive as a post-scan Filter node."""
    df = tiktok.load().filter(
        (F.col("stat_time_day") == "2025-03-05")
        & (F.col("impressions") == "nope")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    assert df.collect() == []  # echoed position '1' != 'nope'


def test_tiktok_contradictory_dates_yield_empty(tiktok):
    df = tiktok.load().filter(
        (F.col("stat_time_day") == "2025-03-05")
        & (F.col("stat_time_day") == "2025-04-01")
    )
    assert df.collect() == []


def test_tiktok_contradictory_id_equalities_yield_empty(tiktok):
    """campaign_id='a' AND campaign_id='b' is a contradiction — an IN
    filtering entry would flip it to OR semantics and return BOTH ids'
    rows, so the scan must plan an empty partition instead."""
    df = tiktok.load().filter(
        (F.col("stat_time_day") == "2025-03-05")
        & (F.col("campaign_id") == "c-77")
        & (F.col("campaign_id") == "c-88")
    )
    assert df.collect() == []


def test_tiktok_duplicate_id_equality_dedupes_not_empty(tiktok):
    """The SAME value twice is not contradictory — one IN entry with
    one deduplicated value."""
    df = tiktok.load().filter(
        (F.col("stat_time_day") == "2025-03-05")
        & (F.col("campaign_id") == "c-77")
        & (F.col("campaign_id") == "c-77")
    )
    rows = df.collect()
    assert len(rows) == 1
    body = json.loads(rows[0]["spend"])
    assert body["filtering"] == [
        {"field_name": "campaign_id", "filter_type": "IN",
         "filter_value": ["c-77"]}
    ]


def test_tiktok_page_loop_until_total_page(spark):
    """47 rows at page_size 10 → 5 pages walked inside one partition."""
    from d2b_dataframework_spark.sources.dsv2 import tiktok as tk

    tk.register(spark)
    df = (
        spark.read.format("tiktok_rest")
        .option("advertiser_id", "adv-1")
        .option("dimensions", "campaign_id")  # lifetime mode: one window
        .option("metrics", "spend,impressions")
        .option("page_size", "10")
        .option("echo_total_rows", "47")
        .option("start_date", "2025-01-01")
        .option("end_date", "2025-01-31")
        .option("transport", TIKTOK_ECHO)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 47
    positions = sorted(int(r["impressions"]) for r in rows)
    assert positions == list(range(1, 48))


# ---------------------------------------------------------------------------
# shopify_rest: date-window + status-param pushdown, parallel Link walks
# (reference request builder d2b_data/shopify_api.py:30-95)
# ---------------------------------------------------------------------------

SHOPIFY_ECHO = "d2b_dataframework_spark.sources.dsv2.testing:ShopifyEchoTransport"


@pytest.fixture(scope="module")
def shopify(spark):
    from d2b_dataframework_spark.sources.dsv2 import shopify as sp

    sp.register(spark)
    return (
        spark.read.format("shopify_rest")
        .option("transport", SHOPIFY_ECHO)
    )


def test_shopify_date_range_pushdown_fans_out_days(shopify):
    """A pushed 3-day created_date range plans 3 day-partitions whose
    request params carry that day's inclusive timestamp bounds; the
    absorbed predicates leave NO post-scan Filter node."""
    df = shopify.load().filter(
        (F.col("created_date") >= "2025-03-01")
        & (F.col("created_date") <= "2025-03-03")
    )
    rows = df.collect()
    days = sorted(r["created_date"] for r in rows)
    assert days == ["2025-03-01", "2025-03-02", "2025-03-03"]
    for r in rows:
        params = json.loads(r["customer_email"])
        assert params["created_at_min"] == f"{r['created_date']}T00:00:00"
        assert params["created_at_max"] == f"{r['created_date']}T23:59:59"
        assert params["status"] == "any"
        assert params["order"] == "created_at asc"
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter\b", plan)


def test_shopify_status_equality_pushdown_reaches_params(shopify):
    """financial_status = 'refunded' becomes a request param and is
    REMOVED post-scan: the echo row carries financial_status='echo' and
    still survives."""
    df = shopify.load().filter(
        (F.col("created_date") == "2025-04-01")
        & (F.col("financial_status") == "refunded")
    )
    rows = df.collect()
    assert len(rows) == 1
    params = json.loads(rows[0]["customer_email"])
    assert params["financial_status"] == "refunded"
    assert rows[0]["financial_status"] == "echo"


def test_shopify_contradictory_status_yields_empty(shopify):
    """financial_status='a' AND ='b' can't be one request param — the
    scan must plan empty, never IN/OR semantics."""
    df = shopify.load().filter(
        (F.col("created_date") == "2025-04-01")
        & (F.col("financial_status") == "refunded")
        & (F.col("financial_status") == "paid")
    )
    assert df.collect() == []


def test_shopify_contradictory_dates_yield_empty(shopify):
    df = shopify.load().filter(
        (F.col("created_date") >= "2025-05-02")
        & (F.col("created_date") <= "2025-05-01")
    )
    assert df.collect() == []


def test_shopify_unsupported_predicate_stays_post_scan(shopify):
    """total_price > 5 is not API-expressible — it returns to Spark and
    is evaluated post-scan (echo emits total_price = position)."""
    df = shopify.load().filter(
        (F.col("created_date") == "2025-04-02") & (F.col("total_price") > 5.0)
    )
    assert df.collect() == []  # echo emits total_price=1.0 at total=1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "total_price" in plan.split("Scan")[0]


def test_shopify_default_window_is_bounded_90_days():
    """With no startdate option and no pushed created_date lower bound,
    the fan-out must default to the trailing 90 days — never an
    epoch-to-today ~9000-task sweep hammering the API (ADVICE r5)."""
    from d2b_dataframework_spark.sources.dsv2.shopify import (
        ShopifyOrdersReader,
        orders_schema,
    )

    reader = ShopifyOrdersReader(orders_schema(), {})
    parts = reader.partitions()
    assert len(parts) == 90
    # explicit startdate still opts in to a longer backfill
    reader2 = ShopifyOrdersReader(
        orders_schema(), {"startdate": "2025-01-01", "enddate": "2025-12-31"}
    )
    assert len(reader2.partitions()) == 365


def test_shopify_link_walk_loops_until_no_next(spark):
    """8 orders at limit 3 → Link pages of 3,3,2 walked inside ONE
    day-partition task."""
    from d2b_dataframework_spark.sources.dsv2 import shopify as sp

    sp.register(spark)
    df = (
        spark.read.format("shopify_rest")
        .option("transport", SHOPIFY_ECHO)
        .option("limit", 3)
        .option("echo_total_orders", 8)
        .load()
        .filter(F.col("created_date") == "2025-06-01")
    )
    rows = df.collect()
    assert sorted(r["total_price"] for r in rows) == [float(i) for i in range(1, 9)]
    assert sorted({r["order_id"] for r in rows}) == list(range(1, 9))


# ---------------------------------------------------------------------------
# linkedin_posts: pushed date lower bound ends the newest-first page walk
# early (VERDICT r5 item #6; reference early-stop semantics
# d2b_data/linkedin_organic.py:299-311)
# ---------------------------------------------------------------------------

LINKEDIN_ECHO = "d2b_dataframework_spark.sources.dsv2.testing:LinkedInEchoTransport"


@pytest.fixture(scope="module")
def linkedin(spark):
    from d2b_dataframework_spark.sources.dsv2 import linkedin as li

    li.register(spark)
    return (
        spark.read.format("linkedin_posts")
        .option("transport", LINKEDIN_ECHO)
        .option("orgs", "urn:li:organization:1")
        .option("pagesize", 3)
    )


def test_linkedin_date_pushdown_early_stops_page_walk(linkedin):
    """Echo org holds 10 posts, one per day newest-first from
    2025-06-30; pagesize 3. A pushed created_date >= 2025-06-27 keeps
    4 posts; the walk must touch only page offsets {0, 3} — the first
    older post (06-26, inside page 2) ends the walk, pages 6 and 9 are
    never fetched. The absorbed predicate leaves NO post-scan Filter."""
    df = linkedin.load().filter(F.col("created_date") >= "2025-06-27")
    rows = df.collect()
    days = sorted(r["created_date"] for r in rows)
    assert days == ["2025-06-27", "2025-06-28", "2025-06-29", "2025-06-30"]
    offsets = {int(r["commentary"]) for r in rows}
    assert offsets == {0, 3}
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter\b", plan)


def test_linkedin_upper_bound_skips_newer_but_keeps_paging(linkedin):
    """created_date <= 2025-06-28 skips the two newer posts but must
    NOT stop paging — the window [06-27, 06-28] yields exactly 2 posts
    from page offsets {0, 3}."""
    df = linkedin.load().filter(
        (F.col("created_date") >= "2025-06-27")
        & (F.col("created_date") <= "2025-06-28")
    )
    rows = df.collect()
    assert sorted(r["created_date"] for r in rows) == ["2025-06-27", "2025-06-28"]


def test_linkedin_org_equality_pushdown_narrows_fanout(spark):
    """org_urn = 'B' against a 2-org estate scans only B's chain; the
    request params echoed in visibility carry author=B."""
    from d2b_dataframework_spark.sources.dsv2 import linkedin as li

    li.register(spark)
    df = (
        spark.read.format("linkedin_posts")
        .option("transport", LINKEDIN_ECHO)
        .option("orgs", "urn:li:organization:A,urn:li:organization:B")
        .option("pagesize", 5)
        .load()
        .filter(
            (F.col("org_urn") == "urn:li:organization:B")
            & (F.col("created_date") >= "2025-06-29")
        )
    )
    rows = df.collect()
    assert rows and all(r["org_urn"] == "urn:li:organization:B" for r in rows)
    params = json.loads(rows[0]["visibility"])
    assert params["author"] == "urn:li:organization:B"
    assert params["q"] == "author"


def test_linkedin_contradictory_orgs_yield_empty(linkedin):
    """org_urn='A' AND org_urn='B' cannot both hold — empty scan, not a
    silently dropped leg."""
    df = linkedin.load().filter(
        (F.col("org_urn") == "urn:li:organization:A")
        & (F.col("org_urn") == "urn:li:organization:B")
    )
    assert df.collect() == []


def test_linkedin_unanchored_walk_is_bounded_90_days():
    """No startdate option, no pushed lower bound: the effective window
    must cap at the trailing 90 days of enddate."""
    from d2b_dataframework_spark.sources.dsv2.linkedin import (
        LinkedInPostsReader,
        posts_schema,
    )

    reader = LinkedInPostsReader(
        posts_schema(),
        {
            "transport": LINKEDIN_ECHO,
            "orgs": "urn:li:organization:1",
            "enddate": "2025-06-30",
            "echo_total_posts": "200",
            "pagesize": "50",
        },
    )
    parts = reader.partitions()
    assert len(parts) == 1
    rows = list(reader.read(parts[0]))
    names = [f.name for f in posts_schema().fields]
    days = [dict(zip(names, r))["created_date"] for r in rows]
    assert min(days) == "2025-04-02"  # 2025-06-30 minus 89 days
    assert len(days) == 90


def test_linkedin_pushed_org_outside_estate_yields_empty(spark):
    """A pushed org_urn equality may only NARROW the configured estate:
    filtering org_urn='C' on an orgs='A,B' estate selects rows the base
    relation never contains, so the scan must be EMPTY — not a page
    walk of C's chain via the API (ADVICE r6: pushdown must never
    broaden the scan into an unconfigured org)."""
    from d2b_dataframework_spark.sources.dsv2 import linkedin as li

    li.register(spark)
    df = (
        spark.read.format("linkedin_posts")
        .option("transport", LINKEDIN_ECHO)
        .option("orgs", "urn:li:organization:A,urn:li:organization:B")
        .option("pagesize", 5)
        .load()
        .filter(F.col("org_urn") == "urn:li:organization:C")
    )
    assert df.collect() == []


def test_linkedin_pushed_org_in_estate_still_narrows(spark):
    """The intersect guard must not break the legitimate case: a pushed
    org that IS configured keeps exactly that org's chain."""
    from d2b_dataframework_spark.sources.dsv2.linkedin import (
        LinkedInPostsReader,
        posts_schema,
    )

    reader = LinkedInPostsReader(
        posts_schema(),
        {
            "transport": LINKEDIN_ECHO,
            "orgs": "urn:li:organization:A,urn:li:organization:B",
        },
    )
    from pyspark.sql.datasource import EqualTo

    leftover = list(reader.pushFilters([EqualTo(("org_urn",), "urn:li:organization:A")]))
    assert leftover == []
    assert reader.orgs == ["urn:li:organization:A"]
    assert not reader.contradictory_org


# ---------------------------------------------------------------------------
# ga4_report: date-range + dimension-equality pushdown reach the request
# body; day/page fan-out (VERDICT r6 item #8; reference day-split +
# offset-loop semantics d2b_data/Google_GA4.py:230-317)
# ---------------------------------------------------------------------------

GA4_ECHO = "d2b_dataframework_spark.sources.dsv2.testing:Ga4EchoTransport"


@pytest.fixture(scope="module")
def ga4(spark):
    from d2b_dataframework_spark.sources.dsv2 import ga4 as g4

    g4.register(spark)
    return (
        spark.read.format("ga4_report")
        .option("transport", GA4_ECHO)
        .option("property", "123")
        .option("dimensions", "country")
        .option("metrics", "reqEcho,activeUsers")
    )


def test_ga4_date_pushdown_narrows_dateranges_no_postscan_filter(ga4):
    """A pushed date window must land in the request's dateRanges (one
    single-day range per partition) and leave NO post-scan Filter."""
    df = ga4.load().filter(
        (F.col("date") >= "2025-06-01") & (F.col("date") <= "2025-06-03")
    )
    rows = df.collect()
    days = sorted({r["date"] for r in rows})
    assert days == ["2025-06-01", "2025-06-02", "2025-06-03"]
    body = json.loads(rows[0]["reqEcho"])
    dr = body["dateRanges"][0]
    assert dr["startDate"] == dr["endDate"] and dr["startDate"] in {
        d for d in days
    }
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bFilter\b", plan)


def test_ga4_dimension_equality_reaches_dimension_filter(ga4):
    """country='c1' must arrive as an EXACT stringFilter in the body and
    only c1 rows come back (the echo honors the filter server-side)."""
    df = ga4.load().filter(
        (F.col("date") == "2025-06-01") & (F.col("country") == "c1")
    )
    rows = df.collect()
    assert rows and all(r["country"] == "c1" for r in rows)
    body = json.loads(rows[0]["reqEcho"])
    flt = body["dimensionFilter"]["filter"]
    assert flt["fieldName"] == "country"
    assert flt["stringFilter"] == {"matchType": "EXACT", "value": "c1"}


def test_ga4_contradictory_dimension_equalities_yield_empty(ga4):
    """country='c0' AND country='c1' cannot both hold — empty scan."""
    df = ga4.load().filter(
        (F.col("date") == "2025-06-01")
        & (F.col("country") == "c0")
        & (F.col("country") == "c1")
    )
    assert df.collect() == []


def test_ga4_offset_loop_walks_pages_within_day(spark):
    """7 rows/day at pagesize 3 → offsets 0,3,6 walked inside ONE day
    partition; all 7 distinct row positions come back."""
    from d2b_dataframework_spark.sources.dsv2 import ga4 as g4

    g4.register(spark)
    df = (
        spark.read.format("ga4_report")
        .option("transport", GA4_ECHO)
        .option("property", "123")
        .option("dimensions", "country")
        .option("metrics", "reqEcho,pos")
        .option("pagesize", 3)
        .option("echo_rows_per_day", 7)
        .option("echo_countries", 1)
        .load()
        .filter(F.col("date") == "2025-06-01")
    )
    rows = df.collect()
    assert sorted(int(r["pos"]) for r in rows) == list(range(1, 8))
    offsets = {json.loads(r["reqEcho"])["offset"] for r in rows}
    assert offsets == {0, 3, 6}


def test_ga4_bounded_day_fans_out_offset_partitions(spark):
    """maxrowsperday=9 at pagesize 3 → 3 offset partitions per day: the
    first two pinned to ONE page each, the LAST open-ended (it walks
    further offsets until a short page, so an underestimate can't
    truncate); a 2-day window plans 6 partitions."""
    from d2b_dataframework_spark.sources.dsv2.ga4 import Ga4ReportReader, report_schema

    reader = Ga4ReportReader(
        report_schema(["country"], ["reqEcho", "pos"], False),
        {
            "transport": GA4_ECHO,
            "property": "123",
            "dimensions": "country",
            "metrics": "reqEcho,pos",
            "pagesize": "3",
            "maxrowsperday": "9",
            "startdate": "2025-06-01",
            "enddate": "2025-06-02",
            "echo_rows_per_day": "7",
            "echo_countries": "1",
        },
    )
    parts = reader.partitions()
    assert len(parts) == 6
    assert sorted({(p.day, p.offset) for p in parts}) == [
        ("2025-06-01", 0), ("2025-06-01", 3), ("2025-06-01", 6),
        ("2025-06-02", 0), ("2025-06-02", 3), ("2025-06-02", 6),
    ]
    # only the last page of each day is open-ended
    assert sorted((p.offset, p.open_ended) for p in parts if p.day == "2025-06-01") == [
        (0, False), (3, False), (6, True),
    ]
    # union of the planned pages covers the day exactly once
    got = [r for p in parts if p.day == "2025-06-01" for r in reader.read(p)]
    names = [f.name for f in reader.schema_.fields]
    poss = sorted(int(dict(zip(names, r))["pos"]) for r in got)
    assert poss == list(range(1, 8))


def test_ga4_underestimated_maxrowsperday_never_truncates(spark):
    """ADVICE r7 (medium): maxrowsperday=3 on a 7-row day plans ONE
    page partition — it must keep walking offsets (the reference's
    Google_GA4 loop never truncates) and return all 7 rows, not
    silently drop rows 4-7."""
    from d2b_dataframework_spark.sources.dsv2.ga4 import Ga4ReportReader, report_schema

    reader = Ga4ReportReader(
        report_schema(["country"], ["reqEcho", "pos"], False),
        {
            "transport": GA4_ECHO,
            "property": "123",
            "dimensions": "country",
            "metrics": "reqEcho,pos",
            "pagesize": "3",
            "maxrowsperday": "3",
            "startdate": "2025-06-01",
            "enddate": "2025-06-01",
            "echo_rows_per_day": "7",
            "echo_countries": "1",
        },
    )
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].open_ended
    got = [r for p in parts for r in reader.read(p)]
    names = [f.name for f in reader.schema_.fields]
    poss = sorted(int(dict(zip(names, r))["pos"]) for r in got)
    assert poss == list(range(1, 8))


def test_ga4_malformed_pushed_date_degrades_to_postscan(spark):
    """ADVICE r7: date > '20250601' (non-ISO) must NOT crash planning
    with ValueError — the comparison is yielded back to Spark as a
    post-scan Filter instead of being absorbed into dateRanges."""
    from pyspark.sql.datasource import GreaterThan, LessThan

    from d2b_dataframework_spark.sources.dsv2.ga4 import Ga4ReportReader, report_schema

    reader = Ga4ReportReader(
        report_schema(["country"], ["reqEcho"], False),
        {"transport": GA4_ECHO, "property": "123"},
    )
    start0, end0 = reader.start_date, reader.end_date
    leftover = list(
        reader.pushFilters(
            [GreaterThan(("date",), "20250601"), LessThan(("date",), "2025-06-30")]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], GreaterThan)
    assert reader.start_date == start0  # malformed bound not absorbed
    assert reader.end_date == "2025-06-29" and end0 != reader.end_date


def test_ga4_yyyymmdd_converts_to_iso(ga4):
    """The echo emits the API's YYYYMMDD date encoding; the reader must
    surface ISO so lexicographic date predicates order correctly."""
    rows = ga4.load().filter(F.col("date") == "2025-06-05").collect()
    assert rows and all(r["date"] == "2025-06-05" for r in rows)
