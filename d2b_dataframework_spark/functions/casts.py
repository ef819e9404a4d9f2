"""Coercion / null-fill / clipping functions (SURVEY §2.7 F9-F12).

References:
- numeric coercion:  d2b_data/ProphetForecaster.py:107-110, youtube_public.py:342
- fillna(0)+int:     d2b_data/linkedin_organic.py:590-592, X_ads.py:281,297
- clip(lower=0):     d2b_data/ProphetForecaster.py:230-233
- round:             d2b_data/ProphetForecaster.py:243-248
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_numeric(col: Column | str, dtype: str = "double") -> Column:
    """``pd.to_numeric(errors='coerce')`` analog (F9): bad input → NULL.

    Uses try_cast so semantics hold even under ANSI mode.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def fill_zero_long(col: Column | str) -> Column:
    """``fillna(0).astype(int)`` analog (F10)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0)).cast("long")


def clip_min(col: Column | str, lower: float = 0.0) -> Column:
    """``clip(lower=)`` analog (F11)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(c, F.lit(lower))


def round_metrics(df: DataFrame, decimals: int | None, exclude: list[str] = ()) -> DataFrame:
    """Round every numeric column (F12); ``decimals=None`` disables,
    matching ProphetForecaster's ``round_decimals=None``."""
    if decimals is None:
        return df
    from pyspark.sql.types import NumericType

    numeric = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude
    ]
    return df.withColumns({c: F.round(F.col(c), decimals) for c in numeric})
