"""Connector library (SURVEY §2.1): each module reconfigures the REST
kernel (pagination strategies + retry policies + date splitter + fan-out)
for one vendor's report semantics, with the flatten schemas from
FIXTURES.md as the declared output contract.

All connectors take an injected transport (tests use
sources.rest.FakeTransport), keeping the suite offline like the
reference's mocked-I/O tests (SURVEY §5).
"""

from d2b_dataframework_spark.sources.connectors import (  # noqa: F401
    alodesk,
    facebook_marketing,
    facebook_organic,
    ga4,
    hubspot,
    instagram_organic,
    linkedin_marketing,
    linkedin_organic,
    search_console,
    serpapi,
    sheets,
    shopify,
    tiktok,
    warehouse,
    x_ads,
    youtube,
)

__all__ = [
    "alodesk",
    "facebook_marketing",
    "facebook_organic",
    "ga4",
    "hubspot",
    "instagram_organic",
    "linkedin_marketing",
    "linkedin_organic",
    "search_console",
    "serpapi",
    "sheets",
    "shopify",
    "tiktok",
    "warehouse",
    "x_ads",
    "youtube",
]
