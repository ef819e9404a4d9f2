"""GA4 batch reports as a Spark Python Data Source with planner
pushdown (VERDICT r6 item #8 — the last high-traffic connector without
a planner-visible twin; ``sources/dsv2/ga4_stream.py`` covers only the
realtime branch).

Reference parity: the reference splits the requested range day-by-day
"to avoid sampling and API limits" and pages each day by ``offset`` in
250k chunks until a short page (d2b_data/Google_GA4.py:230-317); the
option-driven connector (sources/connectors/ga4.py) mirrors that as a
``mapInPandas`` fan-out. This module wires the same semantics into
Catalyst:

- ``pushFilters`` absorbs date-range predicates (``=``, ``<``, ``<=``,
  ``>``, ``>=`` on the ``date`` column) into the request's
  ``dateRanges`` and dimension equality predicates into a
  ``dimensionFilter`` ``andGroup`` of EXACT ``stringFilter``s (the
  Analytics Data API filter shape) — absorbed predicates leave NO
  post-scan Filter node, so rows the API can exclude are never
  transferred;
- ``partitions`` fans the narrowed window out one ``InputPartition``
  per day; each task runs the reference's offset loop. When the
  ``maxrowsperday`` option bounds a day's row count, the fan-out goes
  finer — one partition per (day, offset-page), so even a single hot
  day parallelizes across executors (page count is otherwise
  unknowable at plan time: the API reports ``rowCount`` only in
  responses). The last planned page of each day stays OPEN-ENDED —
  it walks further offsets until a short page — so an option that
  underestimates a day's true row count degrades to serial tail
  fetching, never to silently dropped rows;
- contradictory pushdown (two different equality values for one
  dimension, or an empty date window) plans an EMPTY scan — never a
  silently dropped predicate, and a pushed equality only ever NARROWS
  the request (the LinkedIn org-intersect lesson).

The ``date`` column is ISO ``YYYY-MM-DD`` (converted from the API's
``YYYYMMDD`` dimension encoding) so lexicographic string predicates
order correctly. All other dims/metrics keep the reference's
all-strings contract (Google_GA4.py:130-136).

Transport is injected by dotted path (``transport`` option,
``module.sub:ClassName``) — DataSource instances are pickled to
executors, so the class is re-imported worker-side and constructed
with the options dict. Tests inject an echo transport; production
wires a credentialed HTTP transport the same way.
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
from pyspark.sql.types import StringType, StructField, StructType

from d2b_dataframework_spark.sources.connectors.ga4 import (
    PAGE_SIZE,
    SAMPLING_FIELDS,
    flatten_report,
)


def _iso(value) -> str:
    if isinstance(value, (_dt.date, _dt.datetime)):
        return value.strftime("%Y-%m-%d")
    return str(value)


def _strict_iso(value) -> str | None:
    """The comparison value as ``YYYY-MM-DD`` — or None when it isn't
    strictly that shape.  The column is an ISO string, so a predicate
    against any OTHER string shape (``'20250601'``, ``'june'``) compares
    lexicographically in Spark; absorbing it as a calendar bound would
    silently change its semantics (py3.11's ``fromisoformat`` happily
    parses compact ``YYYYMMDD``, so a parse-success check is NOT enough).
    Such predicates are yielded back for post-scan evaluation instead."""
    s = _iso(value)
    if len(s) != 10 or s[4] != "-" or s[7] != "-":
        return None
    try:
        _dt.date.fromisoformat(s)
    except ValueError:
        return None
    return s


def _shift(iso: str, days: int) -> str:
    return (_dt.date.fromisoformat(iso) + _dt.timedelta(days=days)).isoformat()


def _load_transport(path: str):
    import importlib

    mod, _, cls = path.partition(":")
    return getattr(importlib.import_module(mod), cls)


def _split_csv(raw: str) -> list[str]:
    return [x.strip() for x in raw.split(",") if x.strip()]


def report_schema(dims: list[str], mets: list[str], sampling: bool) -> StructType:
    fields = [StructField("date", StringType())]
    fields += [StructField(c, StringType()) for c in [*dims, *mets]]
    if sampling:
        fields += SAMPLING_FIELDS
    return StructType(fields)


class _PagePartition(InputPartition):
    """One fetch unit: a day, optionally pinned to a single offset page
    (``offset is None`` → walk the day's whole offset chain;
    ``open_ended`` → start at ``offset`` but KEEP walking until a short
    page, so the last planned page of a bounded day can never truncate
    a day whose true row count exceeds the ``maxrowsperday`` option)."""

    def __init__(self, day: str, offset: int | None = None, open_ended: bool = False):
        self.day = day
        self.offset = offset
        self.open_ended = open_ended


class Ga4ReportReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.options = dict(options)
        self.dims = _split_csv(self.options.get("dimensions", "country"))
        self.mets = _split_csv(self.options.get("metrics", "activeUsers"))
        self.start_date = self.options.get("startdate", "2001-01-01")
        self.end_date = self.options.get("enddate", _dt.date.today().isoformat())
        self.dim_filters: dict[str, str] = {}
        self.contradictory = False

    # -- planner integration -------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb date ranges into ``dateRanges`` and dimension
        equalities into ``dimensionFilter``; yield back the rest."""
        for f in filters:
            attr = f.attribute[-1] if getattr(f, "attribute", None) else None
            if attr == "date":
                if isinstance(f, IsNotNull):
                    continue  # structural: every row carries its day
                # A non-ISO comparison value (e.g. date > '20250601')
                # must neither crash planning NOR be absorbed — its
                # string-comparison semantics differ from the calendar
                # bound, so it degrades to a post-scan Filter.
                v = _strict_iso(getattr(f, "value", None))
                if v is None:
                    yield f
                    continue
                if isinstance(f, EqualTo):
                    self.start_date = max(self.start_date, v)
                    self.end_date = min(self.end_date, v)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.start_date = max(self.start_date, v)
                    continue
                if isinstance(f, GreaterThan):
                    self.start_date = max(self.start_date, _shift(v, 1))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.end_date = min(self.end_date, v)
                    continue
                if isinstance(f, LessThan):
                    self.end_date = min(self.end_date, _shift(v, -1))
                    continue
            elif attr in self.dims and isinstance(f, EqualTo):
                v = str(f.value)
                prev = self.dim_filters.get(attr)
                if prev is not None and prev != v:
                    # dim='a' AND dim='b': contradiction — empty scan,
                    # never a dropped leg
                    self.contradictory = True
                else:
                    self.dim_filters[attr] = v
                continue
            yield f  # unsupported — Spark re-applies it post-scan

    # -- execution -----------------------------------------------------------
    def partitions(self) -> list[InputPartition]:
        try:
            start = _dt.date.fromisoformat(self.start_date)
            end = _dt.date.fromisoformat(self.end_date)
        except ValueError:
            return [_PagePartition("")]
        if end < start or self.contradictory:
            return [_PagePartition("")]  # one empty partition
        days = [
            (start + _dt.timedelta(days=i)).isoformat()
            for i in range((end - start).days + 1)
        ]
        max_rows = self.options.get("maxrowsperday")
        if max_rows is None:
            return [_PagePartition(d) for d in days]
        # Bounded day: plan one partition per (day, offset-page) so a
        # hot day's pages fetch in parallel instead of one serial loop.
        # The LAST planned page of each day is open-ended — it keeps
        # walking offsets until a short page, so an underestimated
        # maxrowsperday costs parallelism (the tail fetches serially in
        # one task, like the reference's Google_GA4 offset loop) but
        # NEVER silently drops rows past n_pages*page_size.
        page_size = int(self.options.get("pagesize", PAGE_SIZE))
        n_pages = max(1, -(-int(max_rows) // page_size))
        return [
            _PagePartition(
                d, offset=p * page_size, open_ended=(p == n_pages - 1)
            )
            for d in days
            for p in range(n_pages)
        ]

    def _body(self, day: str, offset: int, limit: int) -> dict:
        body: dict = {
            "dimensions": [{"name": "date"}] + [{"name": d} for d in self.dims],
            "metrics": [{"name": m} for m in self.mets],
            "dateRanges": [{"startDate": day, "endDate": day}],
            "offset": offset,
            "limit": limit,
        }
        if self.dim_filters:
            exprs = [
                {
                    "filter": {
                        "fieldName": k,
                        "stringFilter": {"matchType": "EXACT", "value": v},
                    }
                }
                for k, v in sorted(self.dim_filters.items())
            ]
            body["dimensionFilter"] = (
                exprs[0] if len(exprs) == 1 else {"andGroup": {"expressions": exprs}}
            )
        return body

    def read(self, partition: _PagePartition):
        if not partition.day:
            return
        transport = _load_transport(self.options["transport"])(self.options)
        prop = self.options.get("property", "")
        page_size = int(self.options.get("pagesize", PAGE_SIZE))
        sampling = self.options.get("sampling", "false").lower() == "true"
        names = [f.name for f in self.schema_.fields]
        offset = partition.offset if partition.offset is not None else 0
        single_page = partition.offset is not None and not getattr(
            partition, "open_ended", False
        )
        while True:
            payload = transport.get(
                f"properties/{prop}:batchRunReports",
                self._body(partition.day, offset, page_size),
            )
            page = flatten_report(payload, sampling=sampling)
            for rec in page:
                raw = rec.get("date", "")
                if len(raw) == 8 and raw.isdigit():  # YYYYMMDD → ISO
                    rec["date"] = f"{raw[:4]}-{raw[4:6]}-{raw[6:]}"
                yield tuple(rec.get(n) for n in names)
            if single_page or len(page) < page_size:
                return
            offset += page_size


class Ga4ReportDataSource(DataSource):
    """``spark.read.format("ga4_report").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "ga4_report"

    def schema(self) -> StructType:
        return report_schema(
            _split_csv(self.options.get("dimensions", "country")),
            _split_csv(self.options.get("metrics", "activeUsers")),
            self.options.get("sampling", "false").lower() == "true",
        )

    def reader(self, schema: StructType) -> Ga4ReportReader:
        return Ga4ReportReader(schema, self.options)


def register(spark) -> None:
    """Register the format and enable Python-data-source filter
    pushdown (off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(Ga4ReportDataSource)
