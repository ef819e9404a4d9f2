"""Round-9: r8 ADVICE fixes — the persist-handle re-track leak class
(q_idf_jaccard_pairs / q_cluster_purity_nmi / q_semdedup_capped and the
17 older queries with the same shape), plus the structural guard that
keeps the class extinct: building ANY registry plan and releasing it
must leave Spark's SQL cache empty."""

from __future__ import annotations

import pytest


@pytest.mark.single_leg
def test_release_leaves_no_cached_plans(spark):
    """Every registry query builder must route tracked persist handles
    to its RETURNED frame (``_carry`` in plans/queries.py): a
    ``.select()``/``.orderBy()`` chained on a tracked frame returns a
    NEW DataFrame without ``_d2b_persisted``, and ``cache.release``
    then silently leaks the cached intermediate for the rest of the
    bench/gate session (the r8 ADVICE finding class).

    The check is exact and cheap per query: ``persist()``/``cache()``
    register the plan in Spark's CacheManager at BUILD time (no
    execution needed), and ``release()`` must empty it again.  Queries
    that execute driver-side jobs while building (kmeans seeds, graph
    peels) still only run sf0.001-sized work.
    """
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    sf = "/root/testdata/sf0.001"
    leaks: list[str] = []
    for name, spec in REGISTRY.items():
        df = spec.spark(spark, sf)
        cache.release(df)
        if not cm.isEmpty():
            leaks.append(name)
            cm.clearCache()
    assert not leaks, (
        f"queries leaking cached frames after release(): {leaks} — "
        "wrap the returned frame with _carry(result, *tracked_sources)"
    )


@pytest.mark.single_leg
def test_carry_attaches_all_source_handles(spark):
    """_carry must collect ``_d2b_persisted`` from EVERY source and
    attach the union to the result (q_contrastive_pairs carries two
    independent tracked frames)."""
    from d2b_dataframework_spark.datapipe.cache import track
    from d2b_dataframework_spark.plans.queries import _carry

    a = spark.range(3)
    b = spark.range(4)
    h1 = spark.range(5).persist()
    h2 = spark.range(6).persist()
    try:
        src1 = track(a.select("id"), h1)
        src2 = track(b.select("id"), h2)
        out = _carry(src1.union(src2), src1, src2)
        handles = list(getattr(out, "_d2b_persisted", ()))
        assert h1 in handles and h2 in handles
    finally:
        h1.unpersist()
        h2.unpersist()
