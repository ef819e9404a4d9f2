"""Nested-data functions (SURVEY §2.7 F14-F18, F21-F24) — higher-order
functions, no Python UDFs (§2.10: the reference's per-row lambdas all map
to Catalyst-native expressions).

References:
- struct access w/ default:  d2b_data/shopify_api.py:135-142
- action-array extraction:   d2b_data/Facebook_Marketing.py:259-265
- map→columns expansion:     d2b_data/facebook_organic.py:187-190
- content-type derivation:   d2b_data/linkedin_organic.py:487-497
- lifetime-insight flatten:  d2b_data/facebook_organic.py:156-194
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def struct_get(path: str, default=0) -> Column:
    """``order.get('a',{}).get('b',{}).get('c', default)`` analog (F14)."""
    return F.coalesce(F.col(path), F.lit(default))


def action_value(actions: Column | str, action_type: str, default=0) -> Column:
    """First element of an ``array<struct<action_type,value>>`` whose
    ``action_type`` matches → its ``value``; absent → default (F15)."""
    c = F.col(actions) if isinstance(actions, str) else actions
    matched = F.filter(c, lambda x: x["action_type"] == F.lit(action_type))
    # try_element_at: null (not error) on empty match — ANSI-safe; the
    # reference's dict.get never raises on a missing action type.
    return F.coalesce(F.try_element_at(matched, F.lit(1))["value"], F.lit(default))


def expand_map_to_columns(df: DataFrame, map_col: str, keys: list[str], prefix: str = "") -> DataFrame:
    """Map column → one column per key, absent → 0 (F16).

    With a known key set this is a static projection (no extra job); for
    dynamic keys, collect them first (documented extra job, SURVEY §7.5.3):
    ``keys = [r[0] for r in df.select(F.explode(F.map_keys(c))).distinct().collect()]``
    """
    cols = {
        f"{prefix}{k}": F.coalesce(F.col(map_col).getItem(k), F.lit(0)) for k in keys
    }
    return df.withColumns(cols)


def content_type(content: Column | str) -> Column:
    """CASE over present struct keys → ARTICLE/MEDIA/MULTI_IMAGE/NONE (F18)."""
    c = F.col(content) if isinstance(content, str) else content
    return (
        F.when(c["article"].isNotNull(), "ARTICLE")
        .when(c["media"].isNotNull(), "MEDIA")
        .when(c["multiImage"].isNotNull(), "MULTI_IMAGE")
        .otherwise("NONE")
    )


def lifetime_value(values: Column | str, default=None) -> Column:
    """From ``array<struct<period,value>>`` take the ``lifetime`` period's
    value, falling back to the first element, absent → default (F24)."""
    c = F.col(values) if isinstance(values, str) else values
    # try_element_at on both lookups: a row with no "lifetime" period or an
    # empty values array must yield the default, never an ANSI index error.
    lifetime = F.try_element_at(F.filter(c, lambda v: v["period"] == F.lit("lifetime")), F.lit(1))["value"]
    return F.coalesce(lifetime, F.try_element_at(c, F.lit(1))["value"], F.lit(default))


def json_stringify(col: Column | str) -> Column:
    """Nested column → JSON string (F21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c)
