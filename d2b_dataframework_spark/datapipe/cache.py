"""Persist bookkeeping for the pair-builder operators.

``ngram_jaccard_pairs``, ``simhash_near_dup_pairs``, and
``cosine_near_dup_pairs`` persist a signature table before their
self-join (Catalyst does not reuse the exchange across the two join
sides). The persist must outlive the *returned* plan — the caller
consumes it lazily — so the builder cannot unpersist before returning.
Instead every persisted intermediate is tracked on the returned
DataFrame; callers release them once the result is consumed:

    pairs = simhash_near_dup_pairs(docs)
    pairs.write.parquet(...)
    release(pairs)

In a long-lived session (a streaming driver, a notebook, bench loops)
un-released handles accumulate cached blocks until eviction pressure;
``release`` is the deterministic way out. ``spark.catalog.clearCache()``
also works but drops every cache in the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_d2b_persisted"


def track(result: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``result`` for later release."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(handles))
    return result


def release(df: DataFrame) -> None:
    """Unpersist every intermediate tracked while building ``df``."""
    for h in getattr(df, _ATTR, ()):
        h.unpersist()
    setattr(df, _ATTR, [])
