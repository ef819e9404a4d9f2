"""Exact heavy hitters over unbounded key domains, at shuffle cost
bounded by the *answer* size rather than the key cardinality.

The reference's pandas ETL answers "who are the dominant keys" with a
single-process ``value_counts`` (e.g. top-domain rollups,
``d2b_data/serpapi.py`` competitor-domain counting); at 100 TB the naive
Spark translation — ``groupBy(key).count()`` — shuffles one record per
DISTINCT key, which for url/user/ngram-scale domains is billions of rows
of exchange for an answer that is a handful of keys.

This module implements the classic two-pass exact scheme instead:

1. **Candidate pass** (map-only): each partition counts its own rows
   exactly (a per-partition hash table, Arrow-batched) and emits only
   the keys whose LOCAL count reaches ``phi * local_rows / 2``. By
   pigeonhole, any key with global frequency >= phi has local frequency
   >= phi in at least one partition, so the union of local survivors is
   a SUPERSET of the true heavy hitters; the /2 slack makes the
   guarantee robust to float rounding while keeping the per-partition
   emission bounded by ``2/phi`` keys — the only data that ever crosses
   the wire, regardless of how many distinct keys exist.
2. **Verify pass** (broadcast semi-join): the candidate set (at most
   ``partitions * 2/phi`` keys) is broadcast, the raw table is filtered
   to candidate rows map-side, and only those are exactly counted and
   trimmed to ``count >= ceil(phi * N)``.

The OUTPUT is therefore exact and partition-layout-independent — it
hash-matches ``GROUP BY key HAVING count(*) >= ceil(phi*N)`` on any
engine — while the shuffle volume is O(answer), not O(NDV). The
equivalence is pinned by a declarative-twin test
(tests/test_frequency.py) per the engine's Arrow-stage policy.

Streaming twin: ``streaming/microbatch.py::heavy_hitters_stream`` — a
bounded space-saving sketch per group (approximate, O(capacity) state)
for unbounded streams; this module is the exact batch counterpart.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

__all__ = ["heavy_hitter_candidates", "heavy_hitters"]


def heavy_hitter_candidates(
    df: DataFrame, key_col: str, phi: float
) -> DataFrame:
    """Map-only superset of the keys with global frequency >= ``phi``.

    Emits, per partition, the distinct keys whose local count is at
    least ``phi/2`` of the partition's rows (see module docstring for
    the pigeonhole argument). At most ``2/phi`` keys per partition leave
    the scan; nothing else shuffles. Null keys never qualify.
    """
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    src = df.select(key_col).filter(F.col(key_col).isNotNull())
    out_schema = StructType([src.schema[key_col]])
    local_frac = phi / 2.0

    def _emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Exact per-partition counts: the hash table is bounded by the
        # partition's OWN distinct keys (a partition is a few hundred MB
        # by spark.sql.files.maxPartitionBytes), not the global domain.
        counts: dict = {}
        n_rows = 0
        dtype = None
        for pdf in batches:
            n_rows += len(pdf)
            dtype = pdf[key_col].dtype
            for key, cnt in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(cnt)
        thr = local_frac * n_rows
        keep = [k for k, c in counts.items() if c >= thr]
        series = (
            pd.Series(keep, dtype=dtype)
            if dtype is not None
            else pd.Series(keep, dtype="object")
        )
        yield pd.DataFrame({key_col: series})

    return src.mapInPandas(_emit, schema=out_schema)


def heavy_hitters(df: DataFrame, key_col: str, phi: float) -> DataFrame:
    """Exact keys with frequency >= ``phi`` of ``df``'s non-null rows.

    Returns (key_col, cnt: long, share: double rounded to 6) — exactly
    the rows of ``GROUP BY key HAVING cnt >= ceil(phi * N)``, computed
    with candidate-bounded shuffles (module docstring). Three passes
    over the scan (count, candidates, verify) — each map-only or
    broadcast-filtered, none shuffling per-distinct-key records.
    """
    src = df.select(key_col).filter(F.col(key_col).isNotNull())
    n_total = src.count()
    if n_total == 0:
        return (
            src.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(key_col, "cnt", F.lit(0.0).alias("share"))
        )
    # ``phi`` is interpreted as the DECIMAL the caller wrote, not its
    # nearest binary double: ceil(0.0008 * 10000) must be 8 (as any SQL
    # engine's decimal literal arithmetic computes) — the raw float
    # product is 8.000000000000002 and would ceil to 9.
    thr = math.ceil(Fraction(str(phi)) * n_total)
    cands = heavy_hitter_candidates(src, key_col, phi).distinct()
    exact = (
        src.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(thr))
    )
    return exact.select(
        key_col,
        "cnt",
        F.round(F.col("cnt").cast("double") / F.lit(float(n_total)), 6).alias(
            "share"
        ),
    )
