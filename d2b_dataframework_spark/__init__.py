"""d2b_dataframework_spark — a PySpark-native data-integration & analytics engine.

A ground-up rebuild of the capabilities of the ``d2b_data`` pandas ETL
framework (reference: D2b-Innovation/d2b_dataframework), re-expressed
Spark-first:

- ``core``       — session factory, schema registry, errors, logging/alerts
- ``functions``  — scalar/string/date/nested-column functions (SURVEY §2.7)
- ``operators``  — relational transforms: dedup, joins, pivots, unions (§2.3-2.6)
- ``datapipe``   — large-scale training-data ops: dedup (exact/MinHash-LSH/
                   SimHash/Jaccard), similarity search, text analysis,
                   multimodal plumbing
- ``sources``    — REST-source kernel (paginators, retry, date splitting,
                   fan-out) + connectors modeled on the reference (§2.1)
- ``sinks``      — partitioned idempotent writers (BQ date-shard semantics, §2.2)
- ``forecast``   — distributed per-series forecasting via applyInPandas (§2.8)
- ``streaming``  — micro-batch wrappers over the source kernel (§2.9)
- ``plans``      — the registered query library used by the driver harness
"""

__version__ = "0.1.0"

# Curated flat API: the operators a reference user reaches for, importable
# as ``from d2b_dataframework_spark import keep_latest, pagerank, ...``.
# Lazy (PEP 562) so ``import d2b_dataframework_spark`` stays cheap.
_API = {
    # relational operators
    "keep_latest": "operators.dedup",
    "left_join_fill_zero": "operators.joins",
    "broadcast_dim_join": "operators.joins",
    "pivot_wide": "operators.pivots",
    "unpivot_long": "operators.pivots",
    "concat": "operators.unions",
    "asof_join": "operators.asof",
    "session_summary": "operators.sessions",
    "scd2_apply": "operators.scd",
    "salted_sum": "operators.aggregates",
    "exact_percentiles": "operators.aggregates",
    "key_skew_stats": "operators.aggregates",
    "snapshot_diff": "operators.aggregates",
    "grouped_topk": "operators.aggregates",
    "global_row_number": "operators.ranking",
    "global_ntile": "operators.ranking",
    "last_touch_attribution": "operators.attribution",
    "time_decay_attribution": "operators.attribution",
    "cohort_retention": "operators.attribution",
    "pairwise_pearson": "operators.stats",
    "zscore_normalize": "operators.stats",
    "flatten_hierarchy": "operators.hierarchy",
    "fuzzy_match_pairs": "operators.fuzzy",
    "grid_neighbor_pairs": "operators.spatial",
    "haversine_km": "operators.spatial",
    "zorder_value": "operators.layout",
    "resample_daily_ffill": "operators.timeseries",
    "expect_columns": "operators.quality",
    "expect_unique": "operators.quality",
    "expect_ref_integrity": "operators.quality",
    "quality_report": "operators.quality",
    "observed": "operators.observe",
    "write_with_audit": "operators.observe",
    # training-data pipeline
    "exact_duplicates": "datapipe.dedup",
    "minhash_duplicate_pairs": "datapipe.dedup",
    "simhash_near_dup_pairs": "datapipe.dedup",
    "connected_components": "datapipe.dedup",
    "connected_components_star": "datapipe.dedup",
    "incremental_dedup": "datapipe.dedup",
    "brute_force_topk": "datapipe.similarity",
    "ivf_topk": "datapipe.similarity",
    "cosine_near_dup_pairs": "datapipe.similarity",
    "pq_encode": "datapipe.similarity",
    "pq_topk": "datapipe.similarity",
    "ivfpq_topk": "datapipe.similarity",
    "random_projection": "datapipe.similarity",
    "soft_dedup_weights": "datapipe.dedup",
    "keep_best": "datapipe.dedup",
    "hashed_embedding": "datapipe.text",
    "kmeans_assignments": "datapipe.clustering",
    "label_centroids": "datapipe.clustering",
    "pagerank": "datapipe.graph",
    "triangle_stats": "datapipe.graph",
    "inverted_index": "datapipe.retrieval",
    "retrieve_topk": "datapipe.retrieval",
    "rrf_fuse": "datapipe.retrieval",
    "skyline_2d": "operators.ranking",
    "column_stats": "operators.stats",
    "histogram_partials": "operators.sketches",
    "histogram_quantiles": "operators.sketches",
    "cms_partials": "operators.sketches",
    "cms_estimate": "operators.sketches",
    "assign_split": "datapipe.splits",
    "weighted_sample": "datapipe.splits",
    "priority_sample_topk": "datapipe.splits",
    "temperature_sample": "datapipe.splits",
    "quality_score": "datapipe.text",
    "language_scores": "datapipe.text",
    "bm25_scores": "datapipe.text",
    "pseudonymize": "datapipe.text",
    "chunk_documents": "datapipe.text",
    "chunk_audio": "datapipe.multimodal",
    "sample_video_frames": "datapipe.multimodal",
    "release": "datapipe.cache",
    # round-4 additions
    "bloom_build": "operators.bloom",
    "bloom_might_contain": "operators.bloom",
    "bloom_prune": "operators.bloom",
    "kcore_filter": "datapipe.graph",
    "bfs_hops": "datapipe.graph",
    "jaccard_link_prediction": "datapipe.graph",
    "heavy_hitters": "operators.frequency",
    "heavy_hitter_candidates": "operators.frequency",
    "poisson_bootstrap_means": "operators.stats",
    "bootstrap_ci": "operators.stats",
    "negative_sample_candidates": "datapipe.splits",
    "label_weights": "datapipe.splits",
    "holt_smoothing": "operators.recurrence",
    "cusum_alerts": "operators.recurrence",
    "clamped_running_balance": "operators.recurrence",
    "join_advice": "plans.advisor",
    "ndcg_at_k": "datapipe.retrieval",
    "rank_biased_overlap": "datapipe.retrieval",
    "tfidf_cosine_pairs": "datapipe.retrieval",
    "strip_boilerplate": "datapipe.text",
    "readability_scores": "datapipe.text",
    "rake_keywords": "datapipe.text",
    "decode_png": "datapipe.codecs",
    "encode_png": "datapipe.codecs",
    "decode_wav": "datapipe.codecs",
    "encode_wav": "datapipe.codecs",
    "png_pixel_stats": "datapipe.multimodal",
    "wav_sample_stats": "datapipe.multimodal",
    "image_dhash": "datapipe.multimodal",
    "image_luma_histogram": "datapipe.multimodal",
    "audio_signal_stats": "datapipe.multimodal",
    "hll_ndv": "operators.ndv_sketch",
    "hll_ndv_grouped": "operators.ndv_sketch",
    # sinks
    "write_date_sharded": "sinks.partitioned",
    "upsert_cache": "sinks.partitioned",
    "compact_date_partitions": "sinks.partitioned",
    # session
    "get_session": "core.session",
}


def __getattr__(name: str):
    mod = _API.get(name)
    if mod is None:
        raise AttributeError(f"module 'd2b_dataframework_spark' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f"{__name__}.{mod}"), name)


def __dir__():
    return sorted(list(globals()) + list(_API))
