"""Sheets-style REST egress as a Spark Python Data Source WRITER.

The reference pushes result frames to Google Sheets from the driver,
row-by-row pandas (d2b_data/Google_Sheets.py update/append — K3/K4 in
SURVEY §2.2); the option-driven twin lives in sinks/sheets.py. This
module is the at-scale version: ``df.write.format("sheets_rest")``
streams batched ``values.append`` requests FROM THE EXECUTORS under the
DataSource-V2 commit protocol —

- ``write(iterator)`` runs per partition: rows buffer into
  ``batch_rows``-sized append requests (the Sheets API's sweet spot is
  hundreds of rows per call, not one), each POSTed through the
  injected transport; the task returns a commit message with its row /
  request counts;
- ``commit(messages)`` runs once on the driver after EVERY task
  succeeded — it POSTs a summary marker through the transport (the
  place a production writer flips a "load complete" cell or metadata
  row), giving at-least-once semantics with a detectable completion
  record;
- ``abort()`` POSTs a failure marker so partial loads are flagged for
  cleanup rather than silently half-written (append APIs cannot
  rollback).

``overwrite`` mode clears the target range ONCE, driver-side, before
any task runs (the writer factory executes during planning) — the same
clear-then-append shape as sinks/sheets.py::update_range.

Transport is injected by dotted path exactly like the GSC reader
(sources/dsv2/gsc.py): instances are pickled to executors, so the class
is re-imported worker-side and constructed with the options dict.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

from d2b_dataframework_spark.sources.dsv2.gsc import _load_transport


@dataclass
class SheetsCommit(WriterCommitMessage):
    n_rows: int
    n_requests: int


class SheetsWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options, overwrite: bool):
        self.options = dict(options)
        self.names = [f.name for f in schema.fields]
        self.batch_rows = int(self.options.get("batchrows", 500))
        self.spreadsheet = self.options.get("spreadsheet", "")
        self.range = self.options.get("range", "A1")
        if overwrite:
            # planning-time, driver-side: clear once before any task
            self._transport().clear(self.spreadsheet, self.range)

    def _transport(self):
        return _load_transport(
            self.options.get(
                "transport",
                "d2b_dataframework_spark.sources.dsv2.sheets:UrllibSheetsTransport",
            )
        )(self.options)

    # -- executor side -------------------------------------------------------
    def write(self, iterator: Iterator[Row]) -> SheetsCommit:
        transport = self._transport()
        buf: list[list] = []
        n_rows = n_requests = 0
        for row in iterator:
            buf.append([row[n] for n in self.names])
            if len(buf) >= self.batch_rows:
                transport.append(self.spreadsheet, self.range, buf)
                n_rows += len(buf)
                n_requests += 1
                buf = []
        if buf:
            transport.append(self.spreadsheet, self.range, buf)
            n_rows += len(buf)
            n_requests += 1
        return SheetsCommit(n_rows=n_rows, n_requests=n_requests)

    # -- driver side ---------------------------------------------------------
    def commit(self, messages) -> None:
        total_rows = sum(m.n_rows for m in messages)
        total_reqs = sum(m.n_requests for m in messages)
        self._transport().mark_complete(
            self.spreadsheet, self.range, total_rows, total_reqs
        )

    def abort(self, messages) -> None:
        self._transport().mark_failed(self.spreadsheet, self.range)


class SheetsRestDataSource(DataSource):
    """``df.write.format("sheets_rest").option(...).mode("append"|"overwrite").save()``"""

    @classmethod
    def name(cls) -> str:
        return "sheets_rest"

    def writer(self, schema: StructType, overwrite: bool) -> SheetsWriter:
        return SheetsWriter(schema, self.options, overwrite)


class UrllibSheetsTransport:
    """Minimal production transport for the Sheets values API."""

    def __init__(self, options: dict):
        self.token = options.get("token", "")

    def _post(self, url: str, body: dict) -> dict:
        import json
        import urllib.request

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

    def append(self, spreadsheet: str, range_: str, values: list) -> None:
        self._post(
            "https://sheets.googleapis.com/v4/spreadsheets/"
            f"{spreadsheet}/values/{range_}:append?valueInputOption=RAW",
            {"values": values},
        )

    def clear(self, spreadsheet: str, range_: str) -> None:
        self._post(
            "https://sheets.googleapis.com/v4/spreadsheets/"
            f"{spreadsheet}/values/{range_}:clear",
            {},
        )

    def mark_complete(self, spreadsheet, range_, n_rows, n_requests) -> None:
        self.append(spreadsheet, f"{range_}_status", [["complete", n_rows, n_requests]])

    def mark_failed(self, spreadsheet, range_) -> None:
        self.append(spreadsheet, f"{range_}_status", [["failed"]])


def register(spark) -> None:
    spark.dataSource.register(SheetsRestDataSource)
