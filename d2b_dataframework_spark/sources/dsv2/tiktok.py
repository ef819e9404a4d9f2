"""TikTok Ads report as a Spark Python Data Source with planner pushdown
(SURVEY §7.4 follow-on; VERDICT r3 item #8).

Reference parity: the reference passes ``start_date``/``end_date`` and a
``filtering`` list straight into the request params and walks the range
in ≤30-day windows (d2b_data/tiktok_marketing.py:284-296 param encoding,
:288-296 window step, :404-438 page loop). The option-driven connector
(sources/connectors/tiktok.py) mirrors those semantics; this module
wires them into Catalyst, the same shape as ``dsv2/gsc.py``:

- ``pushFilters`` absorbs ``stat_time_day`` range predicates (``=``,
  ``<``, ``<=``, ``>``, ``>=``) into the request window — narrowing the
  chunk fan-out itself — and id-dimension equality predicates
  (``campaign_id``/``adgroup_id``/``ad_id``, when requested as
  dimensions) into the API's ``filtering`` list (``filter_type: IN``).
  Absorbed predicates vanish from the post-scan plan (plan-asserted in
  tests/test_dsv2.py);
- ``partitions`` fans the (narrowed) range out one ``InputPartition``
  per ≤30-day chunk in time-series mode (``stat_time_day`` requested) —
  a year's backfill is 13 parallel executor tasks, not a serial driver
  loop — or a single 365-day-capped window in lifetime mode;
- each task runs the connector's page-number loop
  (``_fetch_window``) with the TikTok 429-only retry policy, so the
  pagination/flatten/leaf-rename semantics are the SAME code both ways.

Transport is injected by dotted path (the DSv2 pickling contract —
see dsv2/gsc.py docstring); tests assert the pushed request body from
echoed rows.
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

from d2b_dataframework_spark.sources.connectors.tiktok import (
    LIFETIME_CAP_DAYS,
    MAX_WINDOW_DAYS,
    PAGE_SIZE,
    _fetch_window,
    report_schema,
)
from d2b_dataframework_spark.sources.datesplit import cap_range, split_range
from d2b_dataframework_spark.sources.retry import TIKTOK_POLICY

# id dimensions the report API accepts in ``filtering``
_FILTERABLE_IDS = {"campaign_id", "adgroup_id", "ad_id"}


def _shift(iso: str, days: int) -> str:
    return (_dt.date.fromisoformat(iso) + _dt.timedelta(days=days)).isoformat()


def _load_transport(path: str):
    import importlib

    mod, _, cls = path.partition(":")
    return getattr(importlib.import_module(mod), cls)


class _WindowPartition(InputPartition):
    def __init__(self, start: str, end: str):
        self.start = start
        self.end = end


class TikTokReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.options = dict(options)
        self.dimensions = [
            d for d in self.options.get("dimensions", "stat_time_day").split(",") if d
        ]
        self.metrics = [
            m for m in self.options.get("metrics", "spend").split(",") if m
        ]
        self.start_date = self.options.get("start_date", "2001-01-01")
        self.end_date = self.options.get(
            "end_date", _dt.date.today().isoformat()
        )
        self.filtering: list[dict] = []
        self.contradictory_ids = False

    # -- planner integration -------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb stat_time_day ranges into the request window and id
        equality into the API ``filtering`` list; yield back the rest."""
        id_values: dict[str, list[str]] = {}
        for f in filters:
            attr = f.attribute[-1] if getattr(f, "attribute", None) else None
            if attr == "stat_time_day" and "stat_time_day" in self.dimensions:
                if isinstance(f, IsNotNull):
                    continue  # every row carries its window's day
                if isinstance(f, EqualTo):
                    v = str(f.value)
                    self.start_date = max(self.start_date, v)
                    self.end_date = min(self.end_date, v)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.start_date = max(self.start_date, str(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.start_date = max(self.start_date, _shift(str(f.value), 1))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.end_date = min(self.end_date, str(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.end_date = min(self.end_date, _shift(str(f.value), -1))
                    continue
            elif (
                attr in _FILTERABLE_IDS
                and attr in self.dimensions
                and isinstance(f, EqualTo)
            ):
                id_values.setdefault(attr, []).append(str(f.value))
                continue
            yield f  # unsupported — Spark re-applies it post-scan
        # Conjunctive EqualTo on one id dimension with two DISTINCT
        # values (id='a' AND id='b') is a contradiction — an IN entry
        # would flip it to OR semantics, so mark the scan empty instead
        # (same treatment as a contradictory stat_time_day range).
        self.contradictory_ids = any(
            len(set(vs)) > 1 for vs in id_values.values()
        )
        self.filtering = [
            {"field_name": k, "filter_type": "IN", "filter_value": sorted(set(vs))}
            for k, vs in sorted(id_values.items())
        ]

    # -- execution -----------------------------------------------------------
    def partitions(self) -> list[InputPartition]:
        try:
            contradictory = _dt.date.fromisoformat(
                self.end_date
            ) < _dt.date.fromisoformat(self.start_date)
        except ValueError:
            contradictory = False
        contradictory = contradictory or self.contradictory_ids
        if contradictory:  # e.g. stat_time_day = x AND stat_time_day = y
            return [_WindowPartition("", "")]
        if "stat_time_day" in self.dimensions:
            windows = split_range(
                self.start_date, self.end_date, max_days=MAX_WINDOW_DAYS
            )
        else:
            windows = [
                cap_range(
                    self.start_date, self.end_date, max_days=LIFETIME_CAP_DAYS
                )
            ]
        return [_WindowPartition(s, e) for s, e in windows]

    def read(self, partition: _WindowPartition):
        if not partition.start:
            return
        transport = _load_transport(self.options["transport"])(self.options)
        rows = _fetch_window(
            transport,
            self.options.get("advertiser_id", ""),
            partition.start,
            partition.end,
            self.dimensions,
            self.metrics,
            self.options.get("data_level", "AUCTION_AD"),
            int(self.options.get("page_size", PAGE_SIZE)),
            TIKTOK_POLICY,
            filtering=self.filtering or None,
        )
        names = [f.name for f in self.schema_.fields]
        for rec in rows:
            yield tuple(rec.get(n) for n in names)


class TikTokReportDataSource(DataSource):
    """``spark.read.format("tiktok_rest").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "tiktok_rest"

    def schema(self) -> StructType:
        dims = [
            d for d in self.options.get("dimensions", "stat_time_day").split(",") if d
        ]
        mets = [m for m in self.options.get("metrics", "spend").split(",") if m]
        return report_schema(dims, mets)

    def reader(self, schema: StructType) -> TikTokReader:
        return TikTokReader(schema, self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TikTokReportDataSource)
