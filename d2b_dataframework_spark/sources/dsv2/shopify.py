"""Shopify orders as a Spark Python Data Source with planner pushdown
(SURVEY §7.4 follow-on; VERDICT r4 item #8).

Reference parity: the reference passes a ``created_at_min``/
``created_at_max`` range + ``status``/``financial_status`` straight into
the request params and walks RFC-5988 ``Link: next`` pages serially
(d2b_data/shopify_api.py:30-95 — params :41-56, Link walk :85-94). The
option-driven connector (sources/connectors/shopify.py) mirrors those
semantics; this module wires them into Catalyst, the same shape as
``dsv2/gsc.py``/``dsv2/tiktok.py``:

- the scan exposes a ``created_date`` partition column (the ISO day the
  task requested — structural, every emitted row carries its window's
  day) so date predicates are absorbable EXACTLY, independent of the
  API's timestamp formatting;
- ``pushFilters`` absorbs ``created_date`` range predicates (``=``,
  ``<``, ``<=``, ``>``, ``>=``) into the request window — narrowing the
  day fan-out itself — and ``financial_status``/``fulfillment_status``
  equality into the request params. Conjunctive equality on one status
  attribute with two DISTINCT values is a contradiction (an absorbed
  single param would silently drop one leg), so it plans an empty scan;
- ``partitions`` fans the (narrowed) range out one ``InputPartition``
  per day — a year's backfill is 365 parallel executor tasks walking
  their own Link chains, not one serial driver loop. With neither a
  ``startdate`` option nor a pushed ``created_date`` lower bound, the
  window is capped at the trailing 90 days, so an unfiltered
  ``.load()`` can never fan out thousands of API-hammering tasks by
  accident;
- each task reuses the connector's ``flatten_order`` + ``link_pages``
  loop, so pagination/flatten/money semantics are the SAME code both
  ways; unabsorbed predicates are returned to Spark for post-scan eval.

Transport is injected by dotted path (the DSv2 pickling contract — see
dsv2/gsc.py); tests assert the pushed request params from echoed rows.
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

from d2b_dataframework_spark.sources.connectors.shopify import (
    PAGE_LIMIT,
    RAW_SCHEMA,
    _walk_orders,
    flatten_order,
)

# status attributes the orders endpoint accepts as request params
_FILTERABLE_STATUS = {"financial_status", "fulfillment_status"}


def _shift(iso: str, days: int) -> str:
    return (_dt.date.fromisoformat(iso) + _dt.timedelta(days=days)).isoformat()


def _load_transport(path: str):
    import importlib

    mod, _, cls = path.partition(":")
    return getattr(importlib.import_module(mod), cls)


def orders_schema() -> StructType:
    """``created_date`` (the partition day, structural) + the
    connector's flattened order columns."""
    return StructType(
        [StructField("created_date", StringType())] + list(RAW_SCHEMA.fields)
    )


class _DayPartition(InputPartition):
    def __init__(self, day: str):
        self.day = day


class ShopifyOrdersReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.options = dict(options)
        self.end_date = self.options.get(
            "enddate", _dt.date.today().isoformat()
        )
        # Fan-out contract: one InputPartition (= one executor task
        # issuing API requests) per day in [startdate, enddate].  With
        # no startdate option and no pushed created_date lower bound an
        # epoch default would plan ~9000 tasks all hammering the API on
        # an unfiltered load() — so partitions() bounds an UNANCHORED
        # window to the trailing 90 days of the (possibly narrowed)
        # enddate (ADVICE r5); backfills opt in with an explicit
        # startdate, and any pushed created_date =/>/>= predicate
        # anchors the window itself.
        self.start_date = self.options.get("startdate", "2001-01-01")
        self._start_anchored = "startdate" in self.options
        self.status_params: dict[str, str] = {}
        self.contradictory_status = False

    # -- planner integration -------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb created_date ranges into the request window and status
        equality into request params; yield back everything else."""
        status_values: dict[str, list[str]] = {}
        for f in filters:
            attr = f.attribute[-1] if getattr(f, "attribute", None) else None
            if attr == "created_date":
                if isinstance(f, IsNotNull):
                    continue  # every row carries its partition's day
                if isinstance(f, EqualTo):
                    v = str(f.value)
                    self.start_date = max(self.start_date, v)
                    self.end_date = min(self.end_date, v)
                    self._start_anchored = True
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.start_date = max(self.start_date, str(f.value))
                    self._start_anchored = True
                    continue
                if isinstance(f, GreaterThan):
                    self.start_date = max(self.start_date, _shift(str(f.value), 1))
                    self._start_anchored = True
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.end_date = min(self.end_date, str(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.end_date = min(self.end_date, _shift(str(f.value), -1))
                    continue
            elif attr in _FILTERABLE_STATUS and isinstance(f, EqualTo):
                status_values.setdefault(attr, []).append(str(f.value))
                continue
            yield f  # unsupported — Spark re-applies it post-scan
        # financial_status='a' AND financial_status='b' is a
        # contradiction — one request param can't express it, so the
        # scan plans empty (the tiktok id-equality lesson, ADVICE r4).
        self.contradictory_status = any(
            len(set(vs)) > 1 for vs in status_values.values()
        )
        self.status_params = {
            k: vs[0] for k, vs in sorted(status_values.items())
        }

    # -- execution -----------------------------------------------------------
    def partitions(self) -> list[InputPartition]:
        try:
            contradictory = _dt.date.fromisoformat(
                self.end_date
            ) < _dt.date.fromisoformat(self.start_date)
        except ValueError:
            contradictory = False
        if contradictory or self.contradictory_status:
            return [_DayPartition("")]  # one empty partition
        start = _dt.date.fromisoformat(self.start_date)
        end = _dt.date.fromisoformat(self.end_date)
        if not self._start_anchored:
            # nothing bounds the lower edge — cap the sweep at the
            # trailing 90 days instead of an epoch-to-enddate fan-out
            start = max(start, end - _dt.timedelta(days=89))
        return [
            _DayPartition((start + _dt.timedelta(days=i)).isoformat())
            for i in range((end - start).days + 1)
        ]

    def read(self, partition: _DayPartition):
        if not partition.day:
            return
        transport = _load_transport(self.options["transport"])(self.options)
        params = {
            # inclusive timestamp bounds covering exactly this day
            # (shopify_api.py:41-56 param names)
            "created_at_min": f"{partition.day}T00:00:00",
            "created_at_max": f"{partition.day}T23:59:59",
            "status": self.options.get("status", "any"),
            "limit": min(int(self.options.get("limit", PAGE_LIMIT)), PAGE_LIMIT),
            "order": "created_at asc",
            **self.status_params,
        }
        names = [f.name for f in self.schema_.fields]
        for order in _walk_orders(transport, params):
            rec = flatten_order(order)
            rec["created_date"] = partition.day
            yield tuple(rec.get(n) for n in names)


class ShopifyOrdersDataSource(DataSource):
    """``spark.read.format("shopify_rest").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "shopify_rest"

    def schema(self) -> StructType:
        return orders_schema()

    def reader(self, schema: StructType) -> ShopifyOrdersReader:
        return ShopifyOrdersReader(schema, self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ShopifyOrdersDataSource)
