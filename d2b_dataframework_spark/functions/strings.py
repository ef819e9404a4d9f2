"""String functions (SURVEY §2.7 F1-F3, F19, F23) — Catalyst-native.

References:
- urn → id:          d2b_data/linkedin_organic.py:393,426
- truncate:          d2b_data/legacy/FacebookOrganic.py:196
- domain extraction: d2b_data/serp_api.py:57-79
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def urn_id(col: Column | str) -> Column:
    """``'urn:li:organization:123'`` → ``'123'`` (F3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, ":", -1)


def truncate(col: Column | str, n: int = 80) -> Column:
    """``s[:n]`` (F19)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def domain(col: Column | str) -> Column:
    """URL → host without ``www.`` (F23)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.parse_url(c, F.lit("HOST")), r"^www\.", "")


def normalize_whitespace(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim — the
    canonical text-normalization step for fingerprinting/dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))
