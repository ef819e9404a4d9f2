"""Date/time functions (SURVEY §2.7 F4-F8) — all Catalyst-native.

References:
- epoch-ms → UTC timestamp: d2b_data/linkedin_organic.py:297,479-485
- dual-format date parse:   d2b_data/facebook_organic.py:303-333
- region tz → UTC windows:  d2b_data/utc_converter.py:8-61
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The 7 LATAM regions the reference supports (d2b_data/utc_converter.py:8-16).
REGION_TZ = {
    "chile": "America/Santiago",
    "argentina": "America/Argentina/Buenos_Aires",
    "peru": "America/Lima",
    "colombia": "America/Bogota",
    "mexico": "America/Mexico_City",
    "brasil": "America/Sao_Paulo",
    "uruguay": "America/Montevideo",
}


def epoch_ms_to_utc_ts(col: Column | str) -> Column:
    """Epoch milliseconds → UTC timestamp (F4)."""
    return F.timestamp_millis(F.col(col).cast("long") if isinstance(col, str) else col.cast("long"))


def as_instant(col: Column | str) -> Column:
    """Cast a timestamp of either flavor to TIMESTAMP_LTZ.

    Parquet written without the UTC-adjusted flag reads back as
    TIMESTAMP_NTZ under Spark 4's default ``inferTimestampNTZ``, and
    ANSI mode refuses the implicit NTZ→LTZ coercion that epoch
    extractors (``unix_millis``/``unix_micros``) rely on. The explicit
    cast is ANSI-legal, a no-op on LTZ input, and — because the engine
    pins ``spark.sql.session.timeZone=UTC`` (core/session.py) — a
    wall-clock identity on NTZ input.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz")


def utc_ts_to_epoch_ms(col: Column | str) -> Column:
    """UTC timestamp → epoch milliseconds (inverse of F4)."""
    return F.unix_millis(as_instant(col))


def parse_dual_date(col: Column | str) -> Column:
    """Accept 'YYYY-MM-DD' or 'YYYYMMDD'; anything else → NULL (F5).

    The reference raises on unknown formats (facebook_organic.py:303-333);
    at scale the null-then-assert pattern is preferred so a single bad row
    doesn't kill a 100TB scan — callers can count nulls and fail the job.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_to_date(c, "yyyy-MM-dd"), F.try_to_date(c, "yyyyMMdd"))


def region_day_bounds(date_col: Column | str, region: str) -> tuple[Column, Column]:
    """Local [00:00:00, 23:59:59] of `date_col` in `region`, as UTC (F6).

    Mirrors UTCConverter modes start/end (d2b_data/utc_converter.py:53-56).
    """
    tz = REGION_TZ[region.lower()]
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    start_local = F.to_timestamp(d)
    end_local = F.to_timestamp(d) + F.expr("INTERVAL 23 HOURS 59 MINUTES 59 SECONDS")
    return F.to_utc_timestamp(start_local, tz), F.to_utc_timestamp(end_local, tz)


def extracted_at(fixed_clock: str | None = None) -> Column:
    """Extraction-timestamp column (F20). ``fixed_clock`` (ISO string)
    pins the value for reproducible runs (SURVEY §7.5.4)."""
    if fixed_clock is not None:
        return F.to_timestamp(F.lit(fixed_clock))
    return F.current_timestamp()
