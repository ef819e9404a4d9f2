"""Google Search Console as a Spark Python Data Source with planner
pushdown (SURVEY §7.4 — the DSv2 phase-2 item).

Reference parity: the reference pushes field selection and the date
window into the HTTP request itself (d2b_data/search_console.py:219-260
``_create_query`` builds ``startDate``/``endDate``/
``dimensionFilterGroups``). The option-driven connector
(sources/connectors/search_console.py) mirrors those semantics; this
module goes further and wires them into Catalyst:

- ``pushFilters`` absorbs date range predicates (``=``, ``<``, ``<=``,
  ``>``, ``>=`` on the ``date`` column) into ``startDate``/``endDate``
  and dimension equality predicates (``=`` on ``query``/``page``/
  ``country``/``device``) into ``dimensionFilterGroups`` — the absorbed
  filters are REMOVED from the post-scan plan (visible in
  ``explain()``: no Filter node re-checks them), so rows that the API
  can exclude are never transferred at all;
- ``partitions`` fans the (possibly narrowed) date window out one
  ``InputPartition`` per day — each executor task fetches its own day
  with the reference's startRow pagination loop
  (search_console.py:325-392), so a 16-month backfill is parallel
  across the cluster instead of a serial driver loop;
- unabsorbed predicates are returned to Spark and evaluated post-scan
  as usual (correctness never depends on the API honoring the filter).

Transport is injected by dotted path (``transport`` option,
``module.sub:ClassName``) because DataSource instances are pickled to
executors — the class is re-imported worker-side and constructed with
the reader options dict. Tests inject an echo transport and assert the
pushed request body from the returned rows; production wires a
credentialed HTTP transport the same way.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from d2b_dataframework_spark.sources.connectors.search_console import (
    ROW_LIMIT,
    create_query,
    flatten_rows,
    report_schema,
    with_date_dimension,
)

# dimensions the GSC API accepts in dimensionFilterGroups
_FILTERABLE_DIMS = {"query", "page", "country", "device"}


def _iso(value) -> str:
    """Date filter values arrive as datetime.date (typed date column)."""
    if isinstance(value, (_dt.date, _dt.datetime)):
        return value.strftime("%Y-%m-%d")
    return str(value)


def _shift(iso: str, days: int) -> str:
    return (
        _dt.date.fromisoformat(iso) + _dt.timedelta(days=days)
    ).isoformat()


def _load_transport(path: str):
    mod, _, cls = path.partition(":")
    import importlib

    return getattr(importlib.import_module(mod), cls)


class _DayPartition(InputPartition):
    def __init__(self, day: str):
        self.day = day


class GscReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.options = dict(options)
        self.dimensions = with_date_dimension(
            [d for d in self.options.get("dimensions", "query").split(",") if d]
        )
        self.start_date = self.options.get("startdate", "2001-01-01")
        self.end_date = self.options.get(
            "enddate", _dt.date.today().isoformat()
        )
        self.filter_groups: list[dict] = []

    # -- planner integration -------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb date-range + dimension-equality predicates into the
        HTTP request; yield back everything else for post-scan eval."""
        dim_filters: list[dict] = []
        for f in filters:
            attr = f.attribute[-1] if getattr(f, "attribute", None) else None
            if attr == "date":
                if isinstance(f, IsNotNull):
                    # every emitted row carries its partition's day —
                    # the guarantee is structural, so the planner's
                    # companion isnotnull(date) needs no post-scan check
                    continue
                if isinstance(f, EqualTo):
                    v = _iso(f.value)
                    self.start_date = max(self.start_date, v)
                    self.end_date = min(self.end_date, v)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.start_date = max(self.start_date, _iso(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.start_date = max(self.start_date, _shift(_iso(f.value), 1))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.end_date = min(self.end_date, _iso(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.end_date = min(self.end_date, _shift(_iso(f.value), -1))
                    continue
            elif (
                attr in _FILTERABLE_DIMS
                and attr in self.dimensions
                and isinstance(f, EqualTo)
            ):
                # exact-match dimension filter — the API shape the
                # reference builds at search_console.py:241-252
                dim_filters.append(
                    {
                        "dimension": attr,
                        "operator": "equals",
                        "expression": str(f.value),
                    }
                )
                continue
            yield f  # unsupported — Spark re-applies it post-scan
        if dim_filters:
            self.filter_groups = [{"groupType": "and", "filters": dim_filters}]

    # -- execution -----------------------------------------------------------
    def partitions(self) -> list[InputPartition]:
        start = _dt.date.fromisoformat(self.start_date)
        end = _dt.date.fromisoformat(self.end_date)
        if end < start:  # contradictory pushdown (e.g. date = x AND date = y)
            return [_DayPartition("")]  # one empty partition
        ndays = (end - start).days + 1
        return [
            _DayPartition((start + _dt.timedelta(days=i)).isoformat())
            for i in range(ndays)
        ]

    def read(self, partition: _DayPartition):
        if not partition.day:
            return
        transport = _load_transport(
            self.options.get(
                "transport",
                "d2b_dataframework_spark.sources.dsv2.gsc:UrllibTransport",
            )
        )(self.options)
        site = self.options.get("site", "")
        row_limit = int(self.options.get("rowlimit", ROW_LIMIT))
        start_row = 0
        names = [f.name for f in self.schema_.fields]
        while True:
            body = create_query(
                partition.day,
                partition.day,
                self.dimensions,
                self.filter_groups or None,
                self.options.get("searchtype", "web"),
                self.options.get("datastate", "final"),
                row_limit,
                start_row,
            )
            payload = transport.get(site, body)
            page = flatten_rows(payload, self.dimensions)
            for rec in page:
                yield tuple(rec.get(n) for n in names)
            if len(page) < row_limit:
                return
            start_row += row_limit


class GscRestDataSource(DataSource):
    """``spark.read.format("gsc_rest").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "gsc_rest"

    def schema(self) -> StructType:
        dims = with_date_dimension(
            [d for d in self.options.get("dimensions", "query").split(",") if d]
        )
        return report_schema(dims)

    def reader(self, schema: StructType) -> GscReader:
        return GscReader(schema, self.options)


class UrllibTransport:
    """Minimal production transport: POSTs the request body to the GSC
    searchanalytics endpoint with a bearer token from options."""

    def __init__(self, options: dict):
        self.token = options.get("token", "")

    def get(self, site: str, body: dict) -> dict:
        import json
        import urllib.parse
        import urllib.request

        url = (
            "https://searchconsole.googleapis.com/webmasters/v3/sites/"
            f"{urllib.parse.quote(site, safe='')}/searchAnalytics/query"
        )
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode(),
            headers={
                "Authorization": f"Bearer {self.token}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310 - https only
            return json.loads(resp.read().decode())


def register(spark) -> None:
    """Register the format with a session: ``register(spark)`` then
    ``spark.read.format("gsc_rest")``. Also enables Python-data-source
    filter pushdown (off by default in Spark 4.1) — without it Spark
    refuses to plan a reader that implements ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GscRestDataSource)
