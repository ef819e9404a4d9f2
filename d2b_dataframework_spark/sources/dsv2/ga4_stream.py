"""GA4 realtime report as a Spark STREAMING Python Data Source.

The reference's realtime branch (d2b_data/Google_GA4.py:21,30 — one
``runRealtimeReport`` snapshot per invocation) is a polling loop the
caller has to schedule and checkpoint by hand. Structured Streaming
already owns that loop: this source exposes the poll as a
``SimpleDataSourceStreamReader`` so the engine drives cadence
(trigger), exactly-once bookkeeping (offset log) and recovery
(``readBetweenOffsets`` replay) — ``spark.readStream.format(
"ga4_realtime")...load()`` then any sink/foreachBatch downstream.

Design notes:

* **Offsets are poll sequence numbers** (``{"poll": n}``): each
  micro-batch performs exactly one snapshot poll and advances the
  offset by one. The poll result carries ``poll_seq`` so downstream
  dedup/windowing has a stable event key.
* **Driver-side reads by design.** A realtime snapshot is one small
  HTTP response (GA4 caps realtime rows); the Simple reader variant
  runs the fetch on the driver and lets Spark distribute the rows —
  the right trade for low-volume polls (the batch GSC source in
  gsc.py is the executor-parallel shape for backfills).
* **Replay contract**: on restart between ``read`` and ``commit``,
  Spark calls ``readBetweenOffsets(start, end)``. A deterministic
  transport (tests; any API with a replay/export window) reproduces
  the original rows exactly; transports for APIs that cannot replay
  should return the live snapshot instead — the stream then has
  at-least-once rather than exactly-once payload semantics, which is
  inherent to a snapshot API, not this source.
* Transport is injected by dotted path (``transport`` option,
  ``module.sub:ClassName``) exactly like gsc.py, constructed with the
  options dict; it must expose ``poll(endpoint: str, body: dict,
  seq: int) -> dict`` returning a runRealtimeReport-shaped payload.

Flattening reuses the batch connector's header/row walk
(connectors/ga4.py:flatten_report), so the streaming rows match the
reference's string-typed realtime contract column-for-column.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StringType, StructField, StructType

from d2b_dataframework_spark.sources.connectors.ga4 import flatten_report


def _load_transport(path: str):
    module, _, cls = path.partition(":")
    import importlib

    return getattr(importlib.import_module(module), cls)


def _split_opt(options, key: str, default: str) -> list[str]:
    return [c for c in options.get(key, default).split(",") if c]


class Ga4RealtimeStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.options = options
        self.dimensions = _split_opt(options, "dimensions", "country")
        self.metrics = _split_opt(options, "metrics", "activeUsers")
        self.property_id = options.get("propertyid", "")
        self.minute_range = int(options.get("minuterange", 29))
        self._transport = None

    # -- transport -----------------------------------------------------------
    def _get_transport(self):
        if self._transport is None:
            self._transport = _load_transport(
                self.options.get(
                    "transport",
                    "d2b_dataframework_spark.sources.dsv2.ga4_stream:UrllibTransport",
                )
            )(self.options)
        return self._transport

    def _poll(self, seq: int) -> dict:
        body = {
            "dimensions": [{"name": d} for d in self.dimensions],
            "metrics": [{"name": m} for m in self.metrics],
            "minuteRanges": [
                {"name": "window", "startMinutesAgo": self.minute_range}
            ],
        }
        return self._get_transport().poll(
            f"properties/{self.property_id}:runRealtimeReport", body, seq
        )

    def _rows(self, seq: int) -> list[Tuple]:
        # A concrete list, not a generator: the Simple-reader wrapper
        # PICKLES the prefetched records to ship them to executors.
        # Tuples are built positionally against the schema ACTUALLY in
        # force (a user-supplied readStream.schema(...) may reorder
        # columns), with poll_seq resolved by NAME wherever it sits.
        names = [f.name for f in self.schema_.fields]
        out = []
        for rec in flatten_report(self._poll(seq)):
            rec = {**rec, "poll_seq": str(seq)}
            out.append(tuple(rec.get(n) for n in names))
        return out

    # -- streaming contract --------------------------------------------------
    def initialOffset(self) -> dict:
        return {"poll": int(self.options.get("startpoll", 0))}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        seq = int(start["poll"])
        return self._rows(seq), {"poll": seq + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[Tuple]:
        return [
            row
            for seq in range(int(start["poll"]), int(end["poll"]))
            for row in self._rows(seq)
        ]

    def commit(self, end: dict) -> None:
        # Offset bookkeeping lives in Spark's checkpoint; nothing to ack
        # upstream for a snapshot API. Transports may expose an optional
        # hook (e.g. to prune a replay buffer). NOTE: commit may arrive
        # on a reader instance that never served a read (restart paths),
        # so the transport is constructed on demand here too.
        transport = self._get_transport()
        if hasattr(transport, "committed"):
            transport.committed(int(end["poll"]))


class Ga4RealtimeStreamSource(DataSource):
    """``spark.readStream.format("ga4_realtime").option(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "ga4_realtime"

    def schema(self) -> StructType:
        dims = _split_opt(self.options, "dimensions", "country")
        mets = _split_opt(self.options, "metrics", "activeUsers")
        # Reference realtime contract: every dim/metric is a string
        # (Google_GA4.py:130-136); poll_seq appended as the event key.
        return StructType(
            [StructField(c, StringType()) for c in [*dims, *mets, "poll_seq"]]
        )

    def simpleStreamReader(self, schema: StructType) -> Ga4RealtimeStreamReader:
        return Ga4RealtimeStreamReader(schema, self.options)


class UrllibTransport:
    """Production transport: POSTs the realtime body to the GA4 Data
    API with a bearer token from options. ``seq`` is advisory (snapshot
    APIs cannot replay); recovery therefore yields the live snapshot."""

    def __init__(self, options: dict):
        self.token = options.get("token", "")

    def poll(self, endpoint: str, body: dict, seq: int) -> dict:
        import json
        import urllib.request

        req = urllib.request.Request(
            f"https://analyticsdata.googleapis.com/v1beta/{endpoint}",
            data=json.dumps(body).encode(),
            headers={
                "Authorization": f"Bearer {self.token}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310 - https only
            return json.loads(resp.read().decode())


def register(spark) -> None:
    spark.dataSource.register(Ga4RealtimeStreamSource)
