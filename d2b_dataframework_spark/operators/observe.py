"""Zero-cost pipeline instrumentation via Spark's Observation API.

A 100TB load should never pay a second full scan just to report "rows
written / nulls seen / max date". ``df.observe`` attaches accumulator-
backed metric expressions to the plan — they are computed DURING the
action (map-side, no extra job, no extra shuffle) and read back on the
driver afterwards.

This is the engine-native replacement for the reference's habit of
re-counting frames before upload (len(df) checks sprinkled through
d2b_data/Google_Bigquery.py / connector modules): same numbers, zero
extra passes.

Metric expressions must be aggregates over the observed plan's output
(count/sum/min/max/...); they see exactly the rows the action consumed.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach ``metrics`` to the frame. Returns (instrumented_df, obs);
    after ANY action on the instrumented frame, ``obs.get`` holds the
    metric values. Standard usage::

        inst, obs = observed(df, {"n": F.count(F.lit(1)),
                                  "null_keys": F.sum(F.col("k").isNull().cast("long"))})
        inst.write.parquet(path)
        audit = obs.get          # no second scan happened
    """
    obs = Observation()
    named = [m.alias(name) for name, m in metrics.items()]
    return df.observe(obs, *named), obs


def write_with_audit(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, Any]:
    """Write ``df`` and return the audit metrics computed during the
    write itself (defaults to row count). One job total."""
    metrics = metrics or {"n_rows": F.count(F.lit(1))}
    inst, obs = observed(df, metrics)
    inst.write.format(fmt).mode(mode).save(path)
    return dict(obs.get)
