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
