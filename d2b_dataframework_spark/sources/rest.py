"""REST-source kernel: distributed fan-out fetch over a task table.

The reference fetches (day × offset × account) report pages in a serial
driver loop; the Spark-native shape is:

    task list (day/account/page params)
      → spark.createDataFrame(tasks).repartition(n)
      → mapInPandas(fetch_batch)     # executor-side HTTP + flatten
      → one DataFrame, schema declared up front

Parallelism comes from the task axis, not the page axis, for
offset/page-number sources; cursor/Link sources stay serial on the driver
(risk register §7.5.1) and land through ``rows_to_df``.

Transports are injected (``Transport`` protocol) so tests and offline
runs use ``FakeTransport`` — the same mock-payload style as the
reference's test suite (SURVEY §5).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class TransportError(Exception):
    def __init__(self, message: str, status_code: int = 500):
        super().__init__(message)
        self.status_code = status_code


@dataclass
class FakeTransport:
    """Offline transport: canned responses keyed by (endpoint, frozen
    params); optional scripted failures for retry testing."""

    responses: dict = field(default_factory=dict)
    failures: list = field(default_factory=list)  # (n_failures, status_code)
    calls: list = field(default_factory=list)

    @staticmethod
    def key(endpoint: str, params: dict | None) -> str:
        return endpoint + "|" + json.dumps(params or {}, sort_keys=True, default=str)

    def get(self, endpoint: str, params: dict | None = None):
        self.calls.append((endpoint, dict(params or {})))
        if self.failures:
            n, code = self.failures[0]
            if n > 0:
                self.failures[0] = (n - 1, code)
                raise TransportError(f"fake failure {code}", status_code=code)
            self.failures.pop(0)
        k = self.key(endpoint, params)
        if k not in self.responses:
            raise TransportError(f"no fixture for {k}", status_code=404)
        return self.responses[k]

    def post(self, endpoint: str, body: dict | None = None):
        """Record-and-ack write calls (sink egress paths); a canned
        response keyed like ``get`` is returned when one exists."""
        self.calls.append((endpoint, dict(body or {})))
        k = self.key(endpoint, body)
        return self.responses.get(k, {"status": "ok"})


def rows_to_df(
    spark: SparkSession,
    rows: list[dict],
    schema: StructType,
) -> DataFrame:
    """Land driver-fetched row dicts as a DataFrame with a declared
    schema; empty input yields a typed empty DataFrame (the reference's
    empty-result contract, e.g. search_console.py:443-464)."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def fanout_fetch(
    spark: SparkSession,
    tasks: list[dict],
    fetch_task: Callable[[dict], list[dict]],
    schema: StructType,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distribute ``fetch_task`` over a task list via mapInPandas.

    ``fetch_task(task_dict) -> list[row_dict]`` runs executor-side; it
    must be picklable and carry its own transport/retry policy. Output
    columns must match ``schema``. One task maps to one or more rows;
    tasks are spread round-robin via repartition so slow endpoints don't
    convoy on one executor.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not tasks:
        return spark.createDataFrame([], schema)
    task_cols = sorted({k for t in tasks for k in t})
    tasks_norm = [{k: t.get(k) for k in task_cols} for t in tasks]
    tdf = spark.createDataFrame(tasks_norm).repartition(
        num_partitions or min(len(tasks), 64)
    )
    out_cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for task in pdf.to_dict("records"):
                rows.extend(fetch_task(task))
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)

    return tdf.mapInPandas(run, schema)


def with_extraction_metadata(df: DataFrame, fixed_clock: str | None = None) -> DataFrame:
    """Append the reference's F20 ``extracted_at`` audit column."""
    ts = F.to_timestamp(F.lit(fixed_clock)) if fixed_clock else F.current_timestamp()
    return df.withColumn("extracted_at", ts)
