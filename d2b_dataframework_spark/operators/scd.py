"""Slowly-changing-dimension type 2 merge (CDC apply), MERGE-INTO-free.

The reference's engagement cache upsert (K5, d2b_data/facebook_organic.py
cache write via left-anti) is the type-1 cousin of this: here changed rows
are *versioned* instead of replaced, the standard warehouse history table.
Without a Delta/Iceberg MERGE INTO on the classpath, SCD2 is a composition
of anti/semi joins + union — each a single key shuffle, no row-level
mutation, fully idempotent when re-run with the same batch.

History contract: one row per (key, version) with ``valid_from``,
``valid_to`` (NULL = open) and ``is_current``. Scale shape: the three
legs (carried-forward history, closed-out versions, opened versions) are
unions of projections over two inputs joined once on the key; with the
history table bucketed by key the join is co-located and the merge is a
scan + one shuffle of the (much smaller) update batch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_change(tracked: list[str]) -> Column:
    """NULL-safe 'any tracked attribute differs' predicate."""
    diffs = [~F.col(f"h.{c}").eqNullSafe(F.col(f"u.{c}")) for c in tracked]
    return reduce(lambda a, b: a | b, diffs)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_col: str = "effective_date",
) -> DataFrame:
    """Apply an update batch to an SCD2 history table.

    ``history`` columns: key, tracked..., ``valid_from``, ``valid_to``,
    ``is_current``. ``updates`` columns: key, tracked..., effective_col.
    Returns the merged history:

    * non-current rows and current rows of untouched keys pass through;
    * current rows whose tracked attrs changed are CLOSED
      (``valid_to = effective``, ``is_current = false``);
    * changed/new keys gain an OPEN row (``valid_from = effective``);
    * updates identical to the current version are no-ops (idempotent
      re-runs don't create empty versions).
    """
    cols = [key_col, *tracked_cols, "valid_from", "valid_to", "is_current"]
    cur = history.filter(F.col("is_current")).alias("h")
    upd = updates.alias("u")

    joined = cur.join(upd, F.col(f"h.{key_col}") == F.col(f"u.{key_col}"), "inner")
    changed_keys = joined.filter(_any_change(tracked_cols)).select(
        F.col(f"h.{key_col}").alias(key_col)
    )

    closed = (
        history.filter(F.col("is_current"))
        .join(changed_keys, key_col, "left_semi")
        .alias("h")
        .join(upd.select(F.col(key_col), F.col(effective_col)), key_col)
        .select(
            key_col,
            *[f"h.{c}" for c in tracked_cols],
            F.col("h.valid_from").alias("valid_from"),
            F.col(effective_col).alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    opened_changed = (
        upd.join(changed_keys, key_col, "left_semi")
        .select(
            key_col,
            *tracked_cols,
            F.col(effective_col).alias("valid_from"),
            F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    inserts = (
        upd.join(history.select(key_col).distinct(), key_col, "left_anti")
        .select(
            key_col,
            *tracked_cols,
            F.col(effective_col).alias("valid_from"),
            F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    carried = (
        history.filter(~F.col("is_current"))
        .select(*cols)
        .unionByName(
            history.filter(F.col("is_current")).join(
                changed_keys, key_col, "left_anti"
            ).select(*cols)
        )
    )
    return carried.unionByName(closed).unionByName(opened_changed).unionByName(inserts)


def as_of(history: DataFrame, date: str) -> DataFrame:
    """Point-in-time reconstruction over an SCD2 history: the row
    version valid AT ``date`` — ``valid_from <= date`` and the version
    not yet closed by then (``valid_to`` null or ``> date``). A pure
    filter (pushes into the history scan; with the history partitioned
    on valid_from ranges it partition-prunes), the lakehouse
    time-travel query expressed on plain SCD2 columns.
    """
    d = F.lit(date)
    return history.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )
