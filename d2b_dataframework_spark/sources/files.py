"""File-format readers with explicit bad-record policies.

The reference skips malformed rows quietly (P12 semantics,
d2b_data/Alodesk_API.py / schema-CSV loading); at warehouse scale the
engine-native version must be (a) distributed and (b) auditable — a
dropped row should be countable, not silently gone. These wrappers pin
Spark's PERMISSIVE mode with a captured ``_corrupt_record`` column and
split the stream into (good, bad) so the caller can land the bad rows
in a quarantine sink. The parse is cached (one pass serves both sides —
and Spark refuses corrupt-column-only plans on raw scans); release it
with ``datapipe.cache.release(good)`` once both sides are consumed.

Schema is REQUIRED: schema inference is a full extra pass over the data
at 100TB, and a drifting inferred schema breaks downstream writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.cache import track

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with the given DDL schema. Returns
    ``(good, bad)``: ``good`` carries the typed columns, ``bad`` the raw
    corrupt lines (one column, for quarantine + replay).

    Spark quirk pinned by the test: a JSON line that parses but
    mismatches the schema type ALSO lands in ``_corrupt_record`` —
    PERMISSIVE nulls the typed columns and keeps the raw text.
    """
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark refuses plans that reference ONLY the corrupt column of
        # a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
        # documented contract is to materialize the parse first. The
        # cache also means good+bad together cost ONE parse pass.
        .cache()
    )
    good = track(df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL), df)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, header: bool = True, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl` — same (good, bad) contract."""
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
        .cache()  # see read_jsonl: corrupt-column-only plans need it
    )
    good = track(df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL), df)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad
