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

    Result is row-identical to ``fact.join(dim, key, how)``; the salt
    never leaks into the output.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(int(buckets)))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(buckets) - 1)))
    )
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")
