"""DataSource-V2 (Spark Python Data Source API) REST connectors.

Where sources/connectors/* are option-driven fetch functions (the
reference's semantics), this package exposes the same HTTP sources as
PLANNER-INTEGRATED tables: Catalyst calls ``pushFilters`` during
optimization, the absorbed predicates are translated into the HTTP
request body (``startDate``/``endDate``/``dimensionFilterGroups``), and
the pushed filters disappear from the post-scan plan — pushdown you can
assert from ``explain()``, not just from connector options.

Six integration shapes live here: ``gsc`` (batch READER with filter
pushdown + per-day InputPartitions), ``tiktok`` (batch READER with
window/``filtering`` pushdown + per-chunk InputPartitions), ``shopify``
(batch READER with date-window + status-param pushdown, one parallel
Link-chain walk per day), ``linkedin`` (batch READER whose pushed date
lower bound ends each org's newest-first page walk early — pushdown as
early termination), ``sheets`` (batch WRITER under the V2 commit
protocol), and ``ga4_stream`` (STREAMING reader — offset-managed
snapshot polling with deterministic replay for recovery).
"""

from d2b_dataframework_spark.sources.dsv2.ga4_stream import (  # noqa: F401
    Ga4RealtimeStreamSource,
)
from d2b_dataframework_spark.sources.dsv2.gsc import (  # noqa: F401
    GscRestDataSource,
    register,
)
from d2b_dataframework_spark.sources.dsv2.linkedin import (  # noqa: F401
    LinkedInPostsDataSource,
)
from d2b_dataframework_spark.sources.dsv2.sheets import (  # noqa: F401
    SheetsRestDataSource,
)
from d2b_dataframework_spark.sources.dsv2.shopify import (  # noqa: F401
    ShopifyOrdersDataSource,
)
from d2b_dataframework_spark.sources.dsv2.tiktok import (  # noqa: F401
    TikTokReportDataSource,
)


def register_all(spark) -> None:
    """Register every DSv2 format on the session: ``gsc_rest``,
    ``tiktok_rest``, ``shopify_rest`` and ``linkedin_posts`` (batch
    readers w/ pushdown), ``sheets_rest`` (batch writer), and
    ``ga4_realtime`` (streaming reader)."""
    from d2b_dataframework_spark.sources.dsv2 import (
        ga4_stream,
        gsc,
        linkedin,
        sheets,
        shopify,
        tiktok,
    )

    gsc.register(spark)
    sheets.register(spark)
    ga4_stream.register(spark)
    tiktok.register(spark)
    shopify.register(spark)
    linkedin.register(spark)
