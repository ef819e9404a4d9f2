"""Source-kernel tests: paginators, retry policies, date splitting,
fan-out fetch (SURVEY §2.1 pagination schemes, §2.11 R1-R5, §4 window
caps)."""

from __future__ import annotations

import pytest

from d2b_dataframework_spark.core.errors import QuotaExhaustedError
from d2b_dataframework_spark.sources.datesplit import cap_range, default_window, split_range
from d2b_dataframework_spark.sources.pagination import (
    batched_keys,
    cursor_pages,
    early_stop_pages,
    offset_pages,
    page_number_pages,
)
from d2b_dataframework_spark.sources.rest import (
    FakeTransport,
    TransportError,
    fanout_fetch,
    rows_to_df,
)
from d2b_dataframework_spark.sources.retry import AsyncJobPoller, RetryPolicy

# ---------------------------------------------------------------------------
# Paginators
# ---------------------------------------------------------------------------


# pure-Python paginators/retry — no Spark expressions
pytestmark = pytest.mark.single_leg

def test_offset_pages_stops_on_short_page():
    data = list(range(7))
    calls = []

    def fetch(offset, limit):
        calls.append(offset)
        return data[offset : offset + limit]

    pages = list(offset_pages(fetch, page_size=3))
    assert pages == [[0, 1, 2], [3, 4, 5], [6]]
    assert calls == [0, 3, 6]


def test_offset_pages_exact_multiple_fetches_trailing_empty():
    data = list(range(6))
    pages = list(offset_pages(lambda o, l: data[o : o + l], page_size=3))
    assert pages == [[0, 1, 2], [3, 4, 5]]


def test_page_number_pages_uses_total():
    chunks = {1: ["a"], 2: ["b"], 3: ["c"]}

    def fetch(page):
        return chunks[page], 3

    assert list(page_number_pages(fetch)) == [["a"], ["b"], ["c"]]


def test_cursor_pages_terminates_on_none():
    script = {None: (["r1"], "c1"), "c1": (["r2"], None)}
    assert list(cursor_pages(lambda c: script[c])) == [["r1"], ["r2"]]


def test_early_stop_truncates_at_predicate():
    pages = {0: [{"v": 9}, {"v": 8}], 2: [{"v": 3}, {"v": 2}]}

    def fetch(start):
        return pages.get(start, [])

    out = list(early_stop_pages(fetch, lambda r: r["v"] < 4, page_size=2))
    assert out == [[{"v": 9}, {"v": 8}]]  # stopped inside page 2, nothing yielded


def test_batched_keys():
    assert list(batched_keys(list(range(5)), 2)) == [[0, 1], [2, 3], [4]]


# ---------------------------------------------------------------------------
# Retry policies (R1-R5)
# ---------------------------------------------------------------------------


def _flaky(failures: list[int], result="ok"):
    state = {"i": 0}

    def fn():
        if state["i"] < len(failures):
            code = failures[state["i"]]
            state["i"] += 1
            raise TransportError(f"fail {code}", status_code=code)
        return result

    return fn


def test_retry_recovers_after_transient_5xx():
    sleeps = []
    policy = RetryPolicy(max_retries=3, retry_codes=frozenset({500}), jitter=False,
                         sleep=sleeps.append)
    assert policy.call(_flaky([500, 500])) == "ok"
    assert sleeps == [1.0, 2.0]  # 2**0, 2**1


def test_retry_exhaustion_reraises():
    policy = RetryPolicy(max_retries=1, retry_codes=frozenset({500}), jitter=False,
                         sleep=lambda _: None)
    with pytest.raises(TransportError):
        policy.call(_flaky([500, 500, 500]))


def test_abort_code_raises_quota_immediately():
    sleeps = []
    policy = RetryPolicy(max_retries=5, retry_codes=frozenset({500}),
                         abort_codes=frozenset({429}), sleep=sleeps.append)
    with pytest.raises(QuotaExhaustedError):
        policy.call(_flaky([429]))
    assert sleeps == []  # R2: daily quota — no backoff, abort now


def test_non_retry_code_passes_through():
    policy = RetryPolicy(max_retries=5, retry_codes=frozenset({500}), sleep=lambda _: None)
    with pytest.raises(TransportError, match="fail 400"):
        policy.call(_flaky([400]))


def test_async_poller_launch_retries_then_polls():
    sleeps = []
    launches = {"n": 0}

    def launch():
        launches["n"] += 1
        if launches["n"] < 3:
            raise RuntimeError("launch boom")
        return "job1"

    states = iter(["running", "running", "completed"])
    poller = AsyncJobPoller(sleep=sleeps.append, poll_interval=20.0, initial_wait=10.0)
    result = poller.run(launch, lambda j: next(states), lambda j: f"data:{j}")
    assert result == "data:job1"
    assert launches["n"] == 3
    # 2 launch backoffs + initial wait + 2 poll sleeps
    assert sleeps == [1.0, 2.0, 10.0, 20.0, 20.0]


# ---------------------------------------------------------------------------
# Date splitting (§4 window caps)
# ---------------------------------------------------------------------------


def test_split_range_per_day_and_30day():
    assert split_range("2024-01-01", "2024-01-03", 1) == [
        ("2024-01-01", "2024-01-01"),
        ("2024-01-02", "2024-01-02"),
        ("2024-01-03", "2024-01-03"),
    ]
    windows = split_range("2024-01-01", "2024-02-04", 30)
    assert windows == [("2024-01-01", "2024-01-30"), ("2024-01-31", "2024-02-04")]
    with pytest.raises(ValueError):
        split_range("2024-01-02", "2024-01-01")


def test_cap_range_trailing_window():
    assert cap_range("2020-01-01", "2024-01-10", 365) == ("2023-01-11", "2024-01-10")
    assert cap_range("2024-01-05", "2024-01-10", 365) == ("2024-01-05", "2024-01-10")


def test_default_window_f8():
    from datetime import date

    assert default_window(date(2024, 2, 1), 30) == ("2024-01-01", "2024-01-31")


# ---------------------------------------------------------------------------
# Fan-out kernel
# ---------------------------------------------------------------------------


def test_fanout_fetch_distributes_and_flattens(spark):
    tasks = [{"day": f"2024-01-0{i}"} for i in range(1, 4)]

    def fetch_task(task):
        return [{"day": task["day"], "n": i} for i in range(2)]

    df = fanout_fetch(spark, tasks, fetch_task, "day string, n long")
    rows = df.collect()
    assert len(rows) == 6
    assert {r["day"] for r in rows} == {t["day"] for t in tasks}


def test_fanout_fetch_empty_tasks_typed_empty(spark):
    df = fanout_fetch(spark, [], lambda t: [], "a string, b long")
    assert df.count() == 0 and df.columns == ["a", "b"]


def test_rows_to_df_empty_contract(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("x", StringType()), StructField("y", LongType())])
    df = rows_to_df(spark, [], schema)
    assert df.count() == 0 and df.schema == schema


def test_fake_transport_scripted_failures():
    t = FakeTransport(responses={FakeTransport.key("e", None): {"ok": 1}},
                      failures=[(2, 503)])
    with pytest.raises(TransportError):
        t.get("e")
    with pytest.raises(TransportError):
        t.get("e")
    assert t.get("e") == {"ok": 1}
    assert len(t.calls) == 3


def test_read_jsonl_splits_good_and_quarantine(spark, tmp_path):
    from d2b_dataframework_spark.sources.files import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "not json at all\n"
        '{"id": "notanint", "name": "typed-miss"}\n'
        '{"id": 3, "name": "fine"}\n'
    )
    good, bad = read_jsonl(spark, str(p), "id long, name string")
    assert {(r["id"], r["name"]) for r in good.collect()} == {(1, "ok"), (3, "fine")}
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 2 and any("notanint" in r for r in raws)


def test_read_csv_quarantine(spark, tmp_path):
    from d2b_dataframework_spark.sources.files import read_csv_quarantine

    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,ok\nbroken_line_with_no_comma\n2,fine\n")
    good, bad = read_csv_quarantine(spark, str(p), "id long, name string")
    assert {(r["id"], r["name"]) for r in good.collect()} == {(1, "ok"), (2, "fine")}
    assert bad.count() == 1
