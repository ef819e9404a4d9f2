"""Non-linear per-key recurrences — the class a window function cannot
express.

A running sum is a window fold; a running sum CLAMPED at a floor
(account balances, inventory levels, token buckets) is not: each step's
output feeds a non-linear function into the next step, so no
prefix-aggregation decomposes it. The engine's contract for this class:
``groupBy(key).applyInPandas`` — keys distribute across executors, the
recurrence runs vectorized-per-key in Arrow batches, state never leaves
the task. (Same pattern as the forecaster and the streaming EWMA; this
is the batch primitive.)

Determinism: rows are sorted by the caller-given order inside each
group and the float recurrence is evaluated in that exact order — an
oracle replaying the same order (e.g. a recursive CTE) lands on
bit-identical IEEE doubles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def clamped_running_balance(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_col: str,
    floor: float = 0.0,
) -> DataFrame:
    """Per-key ``bal = max(floor, bal + delta)`` over the ordered rows.
    Returns one row per key: final ``balance`` and ``n_clamped`` (steps
    where the floor bit). ``key_col`` must be integral (schema below).
    """
    schema = StructType(
        [
            StructField("key", LongType()),
            StructField("balance", DoubleType()),
            StructField("n_clamped", LongType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        bal, clamps = float(floor), 0
        for d in pdf[delta_col]:
            nxt = bal + float(d)
            if nxt < floor:
                clamps += 1
                bal = floor
            else:
                bal = nxt
        return pd.DataFrame(
            {"key": [int(pdf[key_col].iloc[0])], "balance": [bal], "n_clamped": [clamps]}
        )

    return df.groupBy(key_col).applyInPandas(run, schema)


def cusum_alerts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Per-key one-sided CUSUM change detection: ``s = max(0, s + x -
    target - slack)`` over the ordered rows; an alert fires whenever
    ``s`` crosses ``threshold`` (and the statistic resets to 0 — the
    standard restart-after-signal convention). The sequential-monitoring
    primitive behind drift/regression alerting on metric streams.

    Like :func:`clamped_running_balance`, the max(0, .) clamp makes this
    a NON-LINEAR recurrence no window/prefix-sum can express — same
    ``applyInPandas`` contract: keys distribute, the loop runs per key,
    each step's IEEE ops replay in the caller-given order so a recursive
    -CTE oracle lands on bit-identical doubles.

    Returns one row per key: (key, n_alerts, final_stat, peak_stat).
    ``key_col`` must be integral (same output-schema contract as
    :func:`clamped_running_balance`).
    """
    schema = StructType(
        [
            StructField("key", LongType()),
            StructField("n_alerts", LongType()),
            StructField("final_stat", DoubleType()),
            StructField("peak_stat", DoubleType()),
        ]
    )
    drift = float(target) + float(slack)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s, peak, alerts = 0.0, 0.0, 0
        for x in pdf[value_col]:
            nxt = s + (float(x) - drift)
            s = nxt if nxt > 0.0 else 0.0
            if s > peak:
                peak = s
            if s > threshold:
                alerts += 1
                s = 0.0
        return pd.DataFrame(
            {
                "key": [int(pdf[key_col].iloc[0])],
                "n_alerts": [alerts],
                "final_stat": [s],
                "peak_stat": [peak],
            }
        )

    return df.groupBy(key_col).applyInPandas(run, schema)


def holt_smoothing(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing: ``level = a*x +
    (1-a)*(level+trend); trend = b*(level-prev) + (1-b)*trend`` over the
    ordered rows, seeded level = first value, trend = 0. The level/trend
    state is a coupled non-linear recurrence — same ``applyInPandas``
    contract as the other operators in this module (keys distribute,
    IEEE ops replay in the caller-given order, recursive-CTE oracles
    land bit-identical).

    Returns one row per key: (key: string, level, trend, forecast_next
    = level + trend). ``key_col`` is stringified into the static output
    schema.
    """
    from pyspark.sql.types import StringType

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast_next", DoubleType()),
        ]
    )
    a, b = float(alpha), float(beta)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vs = [float(v) for v in pdf[value_col]]
        level, trend = vs[0], 0.0
        for v in vs[1:]:
            prev = level
            level = a * v + (1.0 - a) * (level + trend)
            trend = b * (level - prev) + (1.0 - b) * trend
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "level": [level],
                "trend": [trend],
                "forecast_next": [level + trend],
            }
        )

    return df.groupBy(key_col).applyInPandas(run, schema)


def croston_forecast(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    demand_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key Croston intermittent-demand smoothing (Croston 1972) over
    an ordered, zero-inflated demand series — the forecasting method for
    series where MOST periods are zero (spare parts, long-tail SKUs),
    where plain exponential smoothing decays toward zero between
    demands. State: ``z`` (demand-size level) and ``p`` (inter-demand
    interval level) update only on demand periods; zero periods grow the
    interval counter ``q``::

        demand x > 0, first:  z = x;              p = q;               q = 1
        demand x > 0, later:  z = a*x + (1-a)*z;  p = a*q + (1-a)*p;   q = 1
        demand x == 0:        (z, p unchanged)                         q += 1

    Forecast per period = ``z / p``. The coupled conditional state is a
    non-linear recurrence — same ``applyInPandas`` contract (and the
    same recursive-CTE-oracle determinism) as the rest of this module.

    Returns one row per key: (key: long, n_periods, n_demand_periods,
    z, p, forecast); keys with NO demand return null z/p and forecast
    0.0. ``key_col`` must be integral.
    """
    schema = StructType(
        [
            StructField("key", LongType()),
            StructField("n_periods", LongType()),
            StructField("n_demand_periods", LongType()),
            StructField("z", DoubleType()),
            StructField("p", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )
    a = float(alpha)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        z = p = None
        q, n_demand = 1, 0
        for x in pdf[demand_col]:
            x = float(x)
            if x > 0.0:
                n_demand += 1
                if z is None:
                    z, p = x, float(q)
                else:
                    z = a * x + (1.0 - a) * z
                    p = a * q + (1.0 - a) * p
                q = 1
            else:
                q += 1
        fc = (z / p) if z is not None else 0.0
        return pd.DataFrame(
            {
                "key": [int(pdf[key_col].iloc[0])],
                "n_periods": [len(pdf)],
                "n_demand_periods": [n_demand],
                "z": [z],
                "p": [p],
                "forecast": [fc],
            }
        )

    return df.groupBy(key_col).applyInPandas(run, schema)


def holt_winters(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    period: int = 7,
) -> DataFrame:
    """Per-key additive Holt-Winters (triple exponential smoothing,
    online zero-init form): level/trend as in :func:`holt_smoothing`
    plus ``period`` seasonal indices updated in rotation::

        level = a*(x - s[idx]) + (1-a)*(level + trend)
        trend = b*(level - prev_level) + (1-b)*trend
        s[idx] = g*(x - level) + (1-g)*s[idx]      idx = t % period

    seeded level = first value, trend = 0, all seasonal indices 0 (the
    indices are LEARNED through the gamma updates — deterministic, no
    pre-period averaging pass, so the oracle's unrolled recursion can
    replay byte-identically). Same ``applyInPandas`` contract as the
    rest of the module. Returns one row per key: (key: string, level,
    trend, season_next, forecast_next = level + trend + season_next),
    where season_next is the index the NEXT observation would use.
    """
    from pyspark.sql.types import StringType

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("season_next", DoubleType()),
            StructField("forecast_next", DoubleType()),
        ]
    )
    a, b, g, m = float(alpha), float(beta), float(gamma), int(period)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vs = [float(v) for v in pdf[value_col]]
        level, trend = vs[0], 0.0
        s = [0.0] * m
        for t in range(1, len(vs)):
            x, idx = vs[t], t % m
            prev = level
            level = a * (x - s[idx]) + (1.0 - a) * (level + trend)
            trend = b * (level - prev) + (1.0 - b) * trend
            s[idx] = g * (x - level) + (1.0 - g) * s[idx]
        nxt = s[len(vs) % m]
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "level": [level],
                "trend": [trend],
                "season_next": [nxt],
                "forecast_next": [level + trend + nxt],
            }
        )

    return df.groupBy(key_col).applyInPandas(run, schema)
