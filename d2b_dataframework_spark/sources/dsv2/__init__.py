"""DataSource-V2 (Spark Python Data Source API) REST connectors.

Where sources/connectors/* are option-driven fetch functions (the
reference's semantics), this package exposes the same HTTP sources as
PLANNER-INTEGRATED tables: Catalyst calls ``pushFilters`` during
optimization, the absorbed predicates are translated into the HTTP
request body (``startDate``/``endDate``/``dimensionFilterGroups``), and
the pushed filters disappear from the post-scan plan — pushdown you can
assert from ``explain()``, not just from connector options.

Three integration shapes live here: ``gsc`` (batch READER with filter
pushdown + per-day InputPartitions), ``sheets`` (batch WRITER under the
V2 commit protocol), and ``ga4_stream`` (STREAMING reader — offset-
managed snapshot polling with deterministic replay for recovery).
"""

from d2b_dataframework_spark.sources.dsv2.ga4_stream import (  # noqa: F401
    Ga4RealtimeStreamSource,
)
from d2b_dataframework_spark.sources.dsv2.gsc import (  # noqa: F401
    GscRestDataSource,
    register,
)
