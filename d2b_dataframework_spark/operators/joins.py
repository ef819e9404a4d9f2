"""Join operators (SURVEY §2.4 J1-J6).

Every helper is a thin, intention-revealing wrapper over DataFrame.join so
Catalyst keeps full visibility (join reordering, broadcast selection, AQE).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def left_join_fill_zero(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    fill_cols: list[str],
    cast: str = "long",
) -> DataFrame:
    """Left equi-join then ``fillna(0).astype(int)`` on the joined metric
    columns (J1 — d2b_data/linkedin_organic.py:589-592)."""
    joined = left.join(right, on, "left")
    return joined.withColumns(
        {c: F.coalesce(F.col(c), F.lit(0)).cast(cast) for c in fill_cols}
    )


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint (J3/J6 —
    d2b_data/X_ads.py:304-308). At 100TB the dim is KBs-MBs; broadcasting
    avoids shuffling the fact table entirely."""
    return fact.join(broadcast(dim), on, how)


def outer_merge_series(frames: list[DataFrame], on: str) -> DataFrame:
    """Iterative full-outer merge on a key (J4 —
    d2b_data/ProphetForecaster.py:237-241). Prefer the long-form
    ``groupBy().pivot()`` shape when series count is large; this exists for
    parity with the reference's per-metric outer merge."""
    return reduce(lambda a, b: a.join(b, on, "full_outer"), frames)


def enrich_lookup(
    base: DataFrame,
    lookup: DataFrame,
    on: list[str] | str,
    default_map: dict | None = None,
) -> DataFrame:
    """Per-key enrichment join (J5): failures in the lookup source appear
    as NULLs, optionally defaulted — reproduces tolerated-per-row-failure
    (R6) semantics relationally."""
    out = base.join(lookup, on, "left")
    if default_map:
        out = out.withColumns(
            {c: F.coalesce(F.col(c), F.lit(v)) for c, v in default_map.items()}
        )
    return out


def delta_fetch_keys(all_keys: DataFrame, cached: DataFrame, on: list[str] | str) -> DataFrame:
    """Keys not yet in the cache — the reference's manual
    ``[u for u in all_urns if u not in cache]`` (K5,
    d2b_data/linkedin_organic.py:643-644) is exactly a LEFT ANTI join."""
    return all_keys.join(cached, on, "left_anti")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for the few-hot-keys case: the fact side
    salts each row into one of ``buckets`` sub-keys (deterministic hash
    of the whole row), the dim side is REPLICATED once per salt — so a
    key that previously funneled into one reducer spreads over
    ``buckets`` of them. The explicit form of what AQE's skew-join does
    for sort-merge plans; use it when the dim is too big to broadcast
    but small enough to replicate (|dim| × buckets rows), or when AQE
    can't see the skew (e.g. skew introduced by an upstream operator in
    the same stage).

    Result is row-identical to ``fact.join(dim, key, how)`` for the
    FACT-PRESERVING join types (inner / left / left_semi / left_anti).
    Dim-preserving types are rejected: the dim side is replicated once
    per salt bucket, so right/full/outer would emit each unmatched dim
    row ``buckets`` times (and null-extended extras for matched keys on
    salt values no fact row landed on). The salt never leaks into the
    output.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving join types only "
            f"(inner/left/left_semi/left_anti), got how={how!r}: the "
            f"replicated dim side would duplicate unmatched dim rows "
            f"{buckets}x under dim-preserving types"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(int(buckets)))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(buckets) - 1)))
    )
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    key: str,
    fpp: float = 0.01,
    expected: int | None = None,
) -> DataFrame:
    """Map-side Bloom pre-filter before an expensive join: build a Bloom
    filter over the SMALL side's DISTINCT keys, broadcast the packed
    bitset, and drop big-side rows that cannot possibly match before
    the shuffle. No false negatives — every surviving row still goes
    through the real join; the filter only removes guaranteed misses,
    cutting shuffle volume by (1 - selectivity) at ~fpp overshoot.

    Engineering notes (PySpark exposes no JVM bloomFilter, so this is a
    self-contained portable one):

    * keys must be INTEGRAL — hashing is vectorized numpy uint64
      multiply-xor-shift, both at build and probe (no per-row Python);
    * the build STREAMS the small side's distinct keys through the
      driver (``toLocalIterator``) — driver memory is the packed bitset
      (m/8 bytes), never the key set;
    * probe is an Arrow-batched pandas UDF testing the broadcast bits.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n = max(1, expected or small.select(key).distinct().count())
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = min(10, max(1, round(m / n * math.log(2))))
    A = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
         0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D, 0x5851F42D4C957F2D,
         0x14057B7EF767814F][:k],
        dtype=np.uint64,
    )

    def _positions(x: "np.ndarray") -> "np.ndarray":
        # (k, len(x)) bit positions; uint64 wrap-around is the hash
        h = x[None, :] * A[:, None]
        h ^= h >> np.uint64(33)
        return (h % np.uint64(m)).astype(np.int64)

    def _wrap(vals: list[int]) -> "np.ndarray":
        # int64 -> uint64 two's-complement wrap, matching the probe's
        # .astype(np.uint64); np.asarray(..., dtype=np.uint64) would
        # instead raise OverflowError on negative keys (build/probe
        # asymmetry).
        return np.asarray(vals, dtype=np.int64).astype(np.uint64)

    bits = np.zeros(m, dtype=bool)
    batch: list[int] = []
    for row in small.select(key).distinct().toLocalIterator():
        if row[0] is None:
            continue
        batch.append(row[0])
        if len(batch) >= 100_000:
            bits[_positions(_wrap(batch)).ravel()] = True
            batch = []
    if batch:
        bits[_positions(_wrap(batch)).ravel()] = True
    packed = np.packbits(bits)
    b_packed = big.sparkSession.sparkContext.broadcast(packed)

    def _maybe_impl(keys):
        p = b_packed.value
        x = keys.to_numpy()
        valid = pd.notna(keys).to_numpy()
        xs = np.where(valid, x, 0).astype(np.uint64)
        pos = _positions(xs)  # (k, n)
        hit = np.ones(len(keys), dtype=bool)
        for i in range(pos.shape[0]):
            pi = pos[i]
            hit &= (p[pi >> 3] >> (7 - (pi & 7)) & 1).astype(bool)
        return pd.Series(hit & valid)

    # hint-free lambda form: pyspark's pandas_udf type-hint inspection
    # can't resolve stringized annotations defined inside a closure
    _maybe = pandas_udf(lambda s: _maybe_impl(s), "boolean")
    return big.filter(_maybe(F.col(key)))
