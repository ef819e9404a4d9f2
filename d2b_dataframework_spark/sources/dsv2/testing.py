"""Contract-test double for the DSv2 REST sources.

The Python Data Source API pickles the reader to executor workers, so a
test transport cannot be a closure over driver-side state — it must be
importable by dotted path worker-side. ``EchoTransport`` solves the
observability problem the same way: instead of recording requests into
driver memory (invisible from a worker), it ECHOES the request body into
the returned rows, so a test asserts what reached the HTTP layer from
the query result itself — the same fixture-payload testing shape the
reference suite uses for its connectors (SURVEY §5), adapted to a
distributed scan.
"""

from __future__ import annotations

import json


class EchoTransport:
    """Pretends the API holds ``echo_total_rows`` rows per day (option,
    default 1) and serves them honoring ``rowLimit``/``startRow`` — so
    the startRow pagination loop is exercised for real. Dimension keys
    encode the request body: ``query`` carries the JSON body,
    ``country``/``page``/``device`` carry the literal ``"echo"``,
    ``date`` carries ``startDate``; ``clicks`` carries the row's global
    1-based position."""

    def __init__(self, options: dict):
        self.total = int(options.get("echo_total_rows", 1))

    def get(self, site: str, body: dict) -> dict:
        dims = body["dimensions"]
        key_for = {
            "query": json.dumps(body, sort_keys=True),
            "date": body["startDate"],
        }
        keys = [key_for.get(d, "echo") for d in dims]
        start = body["startRow"]
        n = max(0, min(body["rowLimit"], self.total - start))
        return {
            "rows": [
                {
                    "keys": keys,
                    "clicks": start + i + 1,
                    "impressions": 10,
                    "ctr": 0.1,
                    "position": 1.5,
                }
                for i in range(n)
            ]
        }


class EmptyTransport:
    """Always returns an empty result set."""

    def __init__(self, options: dict):
        self.options = options

    def get(self, site: str, body: dict) -> dict:
        return {"rows": []}


class RecordingSheetsTransport:
    """Test double for the sheets_rest WRITER: every transport call is
    appended as a JSON line to a uniquely-named file under the ``spool``
    option's directory. Executor tasks run in separate worker processes,
    so driver-side recording is impossible — the filesystem is the
    observable channel, and tests reassemble the request log from the
    spool files."""

    def __init__(self, options: dict):
        self.spool = options["spool"]

    def _log(self, record: dict) -> None:
        import json
        import os
        import uuid

        path = os.path.join(self.spool, f"{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as fh:
            fh.write(json.dumps(record) + "\n")

    def append(self, spreadsheet: str, range_: str, values: list) -> None:
        self._log(
            {"op": "append", "spreadsheet": spreadsheet, "range": range_,
             "n": len(values), "values": values}
        )

    def clear(self, spreadsheet: str, range_: str) -> None:
        self._log({"op": "clear", "spreadsheet": spreadsheet, "range": range_})

    def mark_complete(self, spreadsheet, range_, n_rows, n_requests) -> None:
        self._log(
            {"op": "complete", "spreadsheet": spreadsheet, "range": range_,
             "n_rows": n_rows, "n_requests": n_requests}
        )

    def mark_failed(self, spreadsheet, range_) -> None:
        self._log({"op": "failed", "spreadsheet": spreadsheet, "range": range_})


class FailingSheetsTransport(RecordingSheetsTransport):
    """Raises on append — drives the abort path."""

    def append(self, spreadsheet: str, range_: str, values: list) -> None:
        raise RuntimeError("simulated API failure")


class DeterministicPollTransport:
    """Streaming-source double: poll ``seq`` deterministically yields
    ``seq % 3 + 1`` rows whose values encode the sequence number — so a
    replay (``readBetweenOffsets``) reproduces byte-identical rows and a
    test can assert which polls landed purely from the sink contents.
    ``commit_log`` (option) names a file appended with each committed
    offset — observable driver-side because Simple stream readers run
    on the driver."""

    def __init__(self, options: dict):
        self.commit_log = options.get("commit_log", "")

    def poll(self, endpoint: str, body: dict, seq: int) -> dict:
        dims = [d["name"] for d in body["dimensions"]]
        mets = [m["name"] for m in body["metrics"]]
        return {
            "dimensionHeaders": [{"name": d} for d in dims],
            "metricHeaders": [{"name": m} for m in mets],
            "rows": [
                {
                    "dimensionValues": [
                        {"value": f"{d}-{seq}-{i}"} for d in dims
                    ],
                    "metricValues": [
                        {"value": str(100 * seq + 10 * j + i)}
                        for j, _ in enumerate(mets)
                    ],
                }
                for i in range(seq % 3 + 1)
            ],
        }

    def committed(self, offset: int) -> None:
        if self.commit_log:
            with open(self.commit_log, "a") as f:
                f.write(f"{offset}\n")


class TikTokEchoTransport:
    """Echo double for the tiktok_rest reader: pretends the API holds
    ``echo_total_rows`` rows per window (option, default 1) and serves
    them honoring ``page``/``page_size`` with a real ``total_page``, so
    the page-number loop is exercised. The first metric column carries
    the JSON request body; ``stat_time_day`` carries the window's
    ``start_date``; other dimensions carry ``"echo"``; other metrics
    carry the row's global 1-based position."""

    def __init__(self, options: dict):
        self.total = int(options.get("echo_total_rows", 1))

    def get(self, path: str, body: dict) -> dict:
        import json as _json

        page = int(body["page"])
        size = int(body["page_size"])
        dims = body["dimensions"]
        mets = body["metrics"]
        total_page = max(1, -(-self.total // size))
        start = (page - 1) * size
        n = max(0, min(size, self.total - start))
        body_json = _json.dumps(body, sort_keys=True)
        rows = []
        for i in range(n):
            rows.append(
                {
                    "dimensions": {
                        d: (body["start_date"] if d == "stat_time_day" else "echo")
                        for d in dims
                    },
                    "metrics": {
                        m: (body_json if j == 0 else str(start + i + 1))
                        for j, m in enumerate(mets)
                    },
                }
            )
        return {
            "code": 0,
            "data": {"list": rows, "page_info": {"total_page": total_page}},
        }


class ShopifyEchoTransport:
    """Echo double for the shopify_rest reader: pretends the store holds
    ``echo_total_orders`` orders per requested window (option, default 1)
    and serves them honoring ``limit`` + RFC-5988 Link pagination — the
    Link walk is exercised for real (the "next" URL is an opaque token
    encoding the original params + offset, exactly the opacity contract
    of a real Link header). Field encoding: ``customer_email`` carries
    the JSON request params, ``financial_status``/``fulfillment_status``
    carry the literal ``"echo"``, ``total_price`` carries the order's
    global 1-based position in the window."""

    def __init__(self, options: dict):
        self.total = int(options.get("echo_total_orders", 1))

    def get(self, path_or_url: str, params: dict | None) -> dict:
        if params is None:  # a Link "next" URL — decode the token
            state = json.loads(path_or_url)
            params, start = state["params"], state["offset"]
        else:
            start = 0
        limit = int(params["limit"])
        n = max(0, min(limit, self.total - start))
        orders = [
            {
                "id": start + i + 1,
                "order_number": 1000 + start + i + 1,
                "created_at": f"{params['created_at_min'][:10]}T12:00:00",
                "email": json.dumps(params, sort_keys=True),
                "financial_status": "echo",
                "fulfillment_status": "echo",
                "currency": "USD",
                "total_price": float(start + i + 1),
                "subtotal_price": 10.0,
                "total_discounts": 1.0,
                "total_tax": 2.0,
                "refunds": [],
            }
            for i in range(n)
        ]
        link_next = (
            json.dumps({"params": params, "offset": start + n})
            if start + n < self.total and n == limit
            else None
        )
        return {"orders": orders, "link_next": link_next}


class LinkedInEchoTransport:
    """Echo double for the linkedin_posts reader: pretends each org has
    ``echo_total_posts`` posts (option, default 10), newest-first, one
    per day counting BACKWARD from ``echo_anchor_day`` (default
    2025-06-30) — the shape the early-stop contract needs. Field
    encoding: ``commentary`` carries the page's start offset (so tests
    can count how many pages were actually walked), ``visibility``
    carries the JSON request params."""

    def __init__(self, options: dict):
        self.total = int(options.get("echo_total_posts", 10))
        self.anchor = options.get("echo_anchor_day", "2025-06-30")

    def get(self, path: str, params: dict | None) -> dict:
        import datetime as dt

        start = int(params["start"])
        count = int(params["count"])
        anchor = dt.datetime.fromisoformat(self.anchor).replace(
            tzinfo=dt.timezone.utc
        ) + dt.timedelta(hours=12)
        elements = [
            {
                "id": f"urn:li:share:{start + i + 1}",
                "createdAt": int(
                    (anchor - dt.timedelta(days=start + i)).timestamp() * 1000
                ),
                "commentary": str(start),
                "content": {},
                "visibility": json.dumps(params, sort_keys=True),
                "lifecycleState": "PUBLISHED",
            }
            for i in range(max(0, min(count, self.total - start)))
        ]
        return {"elements": elements}


class Ga4EchoTransport:
    """Echo double for the ga4_report reader: pretends the property
    holds ``echo_rows_per_day`` rows per day (option, default 3),
    spread round-robin over countries ``c0..c{echo_countries-1}``
    (default 3), and serves ``batchRunReports`` honoring
    ``offset``/``limit`` plus any EXACT ``dimensionFilter`` — so the
    offset loop AND the pushed filter are exercised for real. Field
    encoding: the first metric carries the JSON request body (filter
    assertions read it back), other metrics carry the row's global
    1-based position within the day; the ``date`` dimension uses the
    API's YYYYMMDD encoding so the reader's ISO conversion is tested."""

    def __init__(self, options: dict):
        self.per_day = int(options.get("echo_rows_per_day", 3))
        self.n_countries = int(options.get("echo_countries", 3))

    def get(self, path: str, body: dict) -> dict:
        day = body["dateRanges"][0]["startDate"].replace("-", "")
        dims = [d["name"] for d in body["dimensions"]]
        mets = [m["name"] for m in body["metrics"]]
        offset = int(body.get("offset", 0))
        limit = int(body.get("limit", 250_000))
        wanted: dict[str, str] = {}
        df = body.get("dimensionFilter")
        if df:
            exprs = df["andGroup"]["expressions"] if "andGroup" in df else [df]
            for e in exprs:
                wanted[e["filter"]["fieldName"]] = e["filter"]["stringFilter"][
                    "value"
                ]
        body_json = json.dumps(body, sort_keys=True)
        all_rows = []
        for i in range(self.per_day):
            dim_vals = {
                "date": day,
                "country": f"c{i % self.n_countries}",
            }
            if any(dim_vals.get(k) != v for k, v in wanted.items() if k in dim_vals):
                continue
            all_rows.append(
                {
                    "dimensionValues": [
                        {"value": dim_vals.get(d, "echo")} for d in dims
                    ],
                    "metricValues": [
                        {"value": body_json if j == 0 else str(i + 1)}
                        for j, _ in enumerate(mets)
                    ],
                }
            )
        page = all_rows[offset : offset + limit]
        return {
            "dimensionHeaders": [{"name": d} for d in dims],
            "metricHeaders": [{"name": m} for m in mets],
            "rows": page,
            "rowCount": len(all_rows),
        }
