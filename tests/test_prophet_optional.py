"""Real-Prophet execution leg (VERDICT r2 missing #4).

The sandbox this engine is developed in does not ship ``prophet``, so
the M1 Prophet branch (forecast/forecaster.py:_fit_prophet) is normally
exercised only through its import-guard and config plumbing while the
OLS fallback carries the oracle checks. This module runs the REAL
Prophet fit+predict+intervals wherever the dependency exists —
``pytest.importorskip`` makes the absence an explicit skip, never a
silently-untested branch.
"""

from __future__ import annotations

import pytest

prophet = pytest.importorskip("prophet")

import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from d2b_dataframework_spark.forecast.forecaster import (  # noqa: E402
    ForecastConfig,
    forecast,
)


@pytest.fixture(scope="module")
def history(spark):
    """120 days of a trending + weekly-seasonal metric."""
    rows = []
    for i in range(120):
        day = pd.Timestamp("2025-01-01") + pd.Timedelta(days=i)
        value = 100.0 + 0.5 * i + 10.0 * (day.dayofweek in (5, 6))
        rows.append((day.date().isoformat(), value))
    return spark.createDataFrame(rows, "date string, sales double").select(
        F.to_date("date").alias("date"), "sales"
    )


pytestmark = pytest.mark.single_leg


def test_prophet_backend_fit_predict_intervals(history):
    cfg = ForecastConfig(backend="prophet", periods=14, interval_width=0.8)
    out = forecast(history, cfg).orderBy("date").collect()
    assert len(out) == 120 + 14
    future = out[-14:]
    # point forecasts continue the trend (~160 at day 134) and intervals
    # bracket the point estimate
    for r in future:
        assert r["sales_lower"] <= r["sales"] <= r["sales_upper"]
        assert 120.0 < r["sales"] < 220.0


def test_prophet_backend_honors_regressors(history):
    hist = history.withColumn(
        "promo", (F.dayofmonth("date") <= 5).cast("double")
    )
    future = (
        hist.sparkSession.range(1, 15)
        .select(
            F.date_add(F.lit("2025-04-30").cast("date"), F.col("id").cast("int")).alias(
                "date"
            ),
            (F.dayofmonth(
                F.date_add(F.lit("2025-04-30").cast("date"), F.col("id").cast("int"))
            ) <= 5).cast("double").alias("promo"),
        )
    )
    cfg = ForecastConfig(backend="prophet", periods=14, regressors=["promo"])
    out = forecast(hist, cfg, future_regressors=future).orderBy("date").collect()
    assert len(out) == 120 + 14
    assert all(r["sales"] is not None for r in out[-14:])
