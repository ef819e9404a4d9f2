"""LinkedIn organization posts as a Spark Python Data Source with
planner pushdown (SURVEY §7.4 follow-on; VERDICT r5 item #6).

Reference parity: the reference pages an organization's posts
newest-first and STOPS paging entirely at the first post older than the
requested window — posts newer than the window are skipped but paging
continues, posts inside are collected, the first older post ends the
walk (d2b_data/linkedin_organic.py:299-311; page loop :233-319). The
option-driven connector (sources/connectors/linkedin_organic.py
``read_posts``) mirrors those semantics; this module wires them into
Catalyst, the same shape as ``dsv2/gsc.py``/``dsv2/shopify.py``:

- the scan exposes a ``created_date`` column (the UTC day of the post's
  ``createdAt`` epoch-ms) so date predicates are absorbable EXACTLY;
- ``pushFilters`` absorbs ``created_date`` range predicates (``=``,
  ``<``, ``<=``, ``>``, ``>=``) into the early-stop window — a pushed
  lower bound literally ends the page walk sooner, the strongest form
  of pushdown this API offers — and ``org_urn`` equality into the
  org fan-out itself. Conjunctive equality on org_urn with two
  DISTINCT values is a contradiction (one author param per request),
  so it plans an empty scan;
- ``partitions`` fans out one ``InputPartition`` per organization —
  each executor task walks its own author's newest-first page chain
  with the connector's ``early_stop_pages`` loop, so a 50-org estate
  is 50 parallel early-stopping walks, not one serial driver loop;
- with neither a ``startdate`` option nor a pushed lower bound the
  window is capped at the trailing 90 days (the Shopify fan-out
  lesson, ADVICE r5) — here it bounds how deep each page walk digs,
  not the task count;
- unabsorbed predicates are returned to Spark for post-scan eval.

Transport is injected by dotted path (the DSv2 pickling contract — see
dsv2/gsc.py); tests assert early-stop behavior from offsets echoed in
the returned rows.
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

from d2b_dataframework_spark.sources.connectors.linkedin_organic import (
    PAGE_SIZE,
    POSTS_SCHEMA,
    flatten_post,
)
from d2b_dataframework_spark.sources.pagination import early_stop_pages


def _shift(iso: str, days: int) -> str:
    return (_dt.date.fromisoformat(iso) + _dt.timedelta(days=days)).isoformat()


def _load_transport(path: str):
    import importlib

    mod, _, cls = path.partition(":")
    return getattr(importlib.import_module(mod), cls)


def posts_schema() -> StructType:
    """``org_urn`` (the fan-out key) + ``created_date`` (UTC day of
    createdAt, structural) + the connector's flattened post columns."""
    return StructType(
        [
            StructField("org_urn", StringType()),
            StructField("created_date", StringType()),
        ]
        + list(POSTS_SCHEMA.fields)
    )


class _OrgPartition(InputPartition):
    def __init__(self, org: str):
        self.org = org


class LinkedInPostsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.options = dict(options)
        self.orgs = [
            o.strip() for o in self.options.get("orgs", "").split(",") if o.strip()
        ]
        self.end_date = self.options.get("enddate", _dt.date.today().isoformat())
        self.start_date = self.options.get("startdate", "2001-01-01")
        self._start_anchored = "startdate" in self.options
        self.contradictory_org = False

    # -- planner integration -------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb created_date ranges into the early-stop window and
        org_urn equality into the org fan-out; yield back the rest."""
        org_values: list[str] = []
        for f in filters:
            attr = f.attribute[-1] if getattr(f, "attribute", None) else None
            if attr == "created_date":
                if isinstance(f, IsNotNull):
                    continue  # every row carries its post's day
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
            elif attr == "org_urn" and isinstance(f, EqualTo):
                org_values.append(str(f.value))
                continue
            elif attr == "org_urn" and isinstance(f, IsNotNull):
                continue  # structural: every row carries its org
            yield f  # unsupported — Spark re-applies it post-scan
        # org_urn='a' AND org_urn='b' is a contradiction (one author
        # param per request) — plan an empty scan, never drop a leg.
        self.contradictory_org = len(set(org_values)) > 1
        if len(set(org_values)) == 1:
            # A pushed equality may only NARROW the configured estate:
            # the base relation contains rows for self.orgs only, so a
            # filter on an org outside that set selects zero rows — it
            # must never broaden the scan into an unconfigured org.
            pushed = org_values[0]
            if pushed in self.orgs or not self.orgs:
                self.orgs = [pushed]
            else:
                self.contradictory_org = True

    # -- execution -----------------------------------------------------------
    def partitions(self) -> list[InputPartition]:
        try:
            contradictory = _dt.date.fromisoformat(
                self.end_date
            ) < _dt.date.fromisoformat(self.start_date)
        except ValueError:
            contradictory = False
        if contradictory or self.contradictory_org or not self.orgs:
            return [_OrgPartition("")]  # one empty partition
        return [_OrgPartition(org) for org in self.orgs]

    def read(self, partition: _OrgPartition):
        if not partition.org:
            return
        transport = _load_transport(self.options["transport"])(self.options)
        page_size = int(self.options.get("pagesize", PAGE_SIZE))
        start_iso, end_iso = self.start_date, self.end_date
        if not self._start_anchored:
            # nothing bounds the lower edge — cap how deep the
            # newest-first walk digs at the trailing 90 days
            try:
                anchor = _dt.date.fromisoformat(end_iso)
            except ValueError:
                anchor = _dt.date.today()
            start_iso = max(start_iso, (anchor - _dt.timedelta(days=89)).isoformat())
        start_ms = int(
            _dt.datetime.fromisoformat(start_iso)
            .replace(tzinfo=_dt.timezone.utc)
            .timestamp()
            * 1000
        )
        end_ms = (
            int(
                _dt.datetime.fromisoformat(end_iso)
                .replace(tzinfo=_dt.timezone.utc)
                .timestamp()
                * 1000
            )
            + 86_399_999  # inclusive end-of-day
        )

        def fetch(start: int) -> list[dict]:
            payload = transport.get(
                "posts",
                {
                    "q": "author",
                    "author": partition.org,
                    "start": start,
                    "count": page_size,
                },
            )
            return payload.get("elements", [])

        names = [f.name for f in self.schema_.fields]
        # reference early-stop contract (linkedin_organic.py:299-311):
        # newer than the window -> skip but keep paging; inside ->
        # collect; the FIRST older post ends the whole walk
        for batch in early_stop_pages(
            fetch,
            lambda p: p.get("createdAt", 0) < start_ms,
            page_size=page_size,
        ):
            for post in batch:
                ms = post.get("createdAt", 0)
                if not (start_ms <= ms <= end_ms):
                    continue
                rec = flatten_post(post)
                rec["org_urn"] = partition.org
                rec["created_date"] = (
                    _dt.datetime.fromtimestamp(ms / 1000, tz=_dt.timezone.utc)
                    .date()
                    .isoformat()
                )
                yield tuple(rec.get(n) for n in names)


class LinkedInPostsDataSource(DataSource):
    """``spark.read.format("linkedin_posts").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "linkedin_posts"

    def schema(self) -> StructType:
        return posts_schema()

    def reader(self, schema: StructType) -> LinkedInPostsReader:
        return LinkedInPostsReader(schema, self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LinkedInPostsDataSource)
