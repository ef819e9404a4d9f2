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
