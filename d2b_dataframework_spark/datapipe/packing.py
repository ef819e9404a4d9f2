"""Sequence-packing plan: assign documents/chunks to fixed-token-budget
training packs (the concat-and-split convention used by T5/GPT data
pipelines — documents are concatenated in a deterministic order and the
stream is cut every ``budget`` tokens, so packs are exactly full and
items may straddle a boundary).

Scale design: ONE window cumulative sum per shard. The deterministic
order inside a shard is (md5(salt:id), id) — the engine's portable hash
(datapipe/splits.py convention), so the plan is reproducible on any
engine and independent of physical layout. Shard by enough keys
(``partition_cols``, e.g. split + a hash bucket) that each shard's sort
fits an executor: packing is embarrassingly parallel across shards
because pack ids are namespaced per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_plan(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    partition_cols: list[str] | None = None,
    salt: str = "pack",
) -> DataFrame:
    """Add ``pack_id`` and ``offset_in_pack`` (both per shard) to every
    row. A row's tokens occupy [offset, offset + n) of the concatenated
    shard stream; ``pack_id = offset // budget`` names the pack where
    the row STARTS (concat-and-split: long rows spill into the next
    pack, which is how training pipelines actually cut the stream).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    parts = [F.col(c) for c in (partition_cols or [])]
    w = (
        Window.partitionBy(*parts)
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w).cast("long")
    offset = cum - F.col(token_col).cast("long")
    return df.select(
        *[F.col(c) for c in (partition_cols or [])],
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
        # exact integer division (avoid double rounding on huge offsets)
        ((offset - offset % F.lit(int(budget))) / F.lit(int(budget)))
        .cast("long")
        .alias("pack_id"),
        (offset % F.lit(int(budget))).cast("long").alias("offset_in_pack"),
    )
