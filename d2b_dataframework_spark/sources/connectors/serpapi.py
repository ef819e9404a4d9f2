"""SerpApi client shell (SURVEY §2.1 S33, §2.7 F23/A7).

Reference (d2b_data/serp_api.py): only the api-key health check is live
code (:43-54) — the SERP-analysis body is commented out (:57-224). We
implement the health check plus DataFrame-native versions of the two
commented analyses (domain extraction + organic-position frequency
top-N), since they are the module's documented intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d2b_dataframework_spark.functions.strings import domain


def check_api_key(transport, api_key: str) -> dict:
    """S33: live account call; returns quota info
    (serp_api.py:43-54). Raises on transport failure — an invalid key
    should stop the pipeline at construction, like the reference."""
    payload = transport.get("account", {"api_key": api_key})
    return {
        "plan_searches_left": int(payload.get("plan_searches_left", 0)),
        "this_month_usage": int(payload.get("this_month_usage", 0)),
    }


def organic_domains(results: DataFrame, link_col: str = "link") -> DataFrame:
    """F23: organic-result links → bare domains (serp_api.py:57-79)."""
    return results.withColumn("domain", domain(link_col))


def top_competitor_domains(
    results: DataFrame,
    client_domain: str,
    top_n: int = 10,
    link_col: str = "link",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """A7: domain frequency top-N excluding the client and a blocklist
    (serp_api.py:170-193) — groupBy/count/orderBy/limit instead of a
    driver-side Counter."""
    blocked = [client_domain, *(blocklist or [])]
    return (
        organic_domains(results, link_col)
        .filter(~F.col("domain").isin(blocked))
        .groupBy("domain")
        .count()
        .orderBy(F.col("count").desc(), F.col("domain").asc())
        .limit(top_n)
    )
