"""URL canonicalization + host-level dedup rollup.

The standard pre-dedup stage of every web-corpus pipeline (CCNet /
RefinedWeb lineage): raw crawl URLs arrive in mixed case, with default
ports, tracking parameters, shuffled query order, fragments and
trailing slashes — and the SAME page therefore appears under many raw
strings.  Canonicalizing before content dedup removes the cheapest
duplicate class for free and gives the per-host crawl-health rollup
(dup rate by host) that decides recrawl/blocklist policy.

Everything here is Catalyst-native string/array expressions (regexp
decomposition + HOF filter/sort on the query params) — no UDFs, so the
canonical form is a map-side projection at any corpus scale, and the
identical regex/HOF pipeline is replayable in the DuckDB oracle
(plans/queries.py q_url_host_dedup).

Canonical form (documented contract, applied in this order):

0. surrounding ASCII whitespace trimmed from the raw URL string
1. scheme lowercased
2. host lowercased; a leading ``www.`` is stripped
3. default ports dropped (``:80`` for http, ``:443`` for https);
   non-default ports kept
4. fragment dropped
5. tracking parameters dropped: any ``utm_*`` key plus the exact keys
   ``fbclid``/``gclid``/``msclkid``/``ref``/``mc_cid``/``mc_eid``
6. surviving query params sorted bytewise; empty query drops the ``?``
7. trailing slashes stripped from the path (``/a/`` == ``/a``; a bare
   root path collapses to the empty string)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# exact-match tracking keys (utm_* is handled as a prefix)
_TRACKING_KEYS_RE = r"^(fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL string per the module contract — pure Catalyst."""
    url = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    authority = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(
        F.regexp_extract(authority, r"^([^:]*)", 1), r"^www\.", ""
    )
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    port_part = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    # path+query+fragment = rest minus the authority prefix
    pathq = F.substring(rest, F.length(authority) + 1, F.lit(2147483647))
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?#]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~(p.rlike(_TRACKING_KEYS_RE)),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_host(canonical: Column | str) -> Column:
    """Host component of an already-canonical URL."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.regexp_extract(c, r"^[a-z0-9+.-]*://([^/:?#]*)", 1)


def host_dedup_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl-dedup report over raw URLs: record count, distinct
    raw strings, distinct canonical URLs, and the canonical dup rate
    (1 - canonical/records).  One projection + one groupBy(host) — the
    shuffle key is the host, so the rollup is linear and the canonical
    form itself never shuffles raw text twice."""
    canon = df.select(
        F.col(url_col).alias("_raw"),
        canonicalize_url(url_col).alias("_canon"),
    ).withColumn("host", url_host(F.col("_canon")))
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.countDistinct("_raw").cast("long").alias("n_raw"),
        F.countDistinct("_canon").cast("long").alias("n_canonical"),
        F.round(
            F.lit(1.0)
            - F.countDistinct("_canon").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


# HTML boilerplate stripping (trafilatura/Dolma-lite): the pre-clean
# every web-crawl corpus runs before quality scoring and dedup.  Pure
# Catalyst regex pipeline — map-side at any scale, replayable verbatim
# in the DuckDB oracle.  Documented extraction order (each step feeds
# the next):
#
# 1. <script>/<style> elements dropped WITH their content (case-
#    insensitive, dotall)
# 2. HTML comments <!-- ... --> dropped
# 3. remaining tags <...> replaced by a space (so "</p><p>" never
#    glues two words together)
# 4. the five predefined XML entities decoded (&amp; LAST so "&amp;lt;"
#    decodes to the literal "&lt;", not "<")
# 5. whitespace runs collapsed, ends trimmed
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]+>"
_HREF_RE = r"(?i)<a\s[^>]*href"


def strip_html(col: Column | str) -> Column:
    """Visible text of an HTML payload per the module contract."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _SCRIPT_RE, " ")
    c = F.regexp_replace(c, _STYLE_RE, " ")
    c = F.regexp_replace(c, _COMMENT_RE, " ")
    c = F.regexp_replace(c, _TAG_RE, " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_text_stats(df: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id") -> DataFrame:
    """Extracted text + the link-density screen: anchor count over
    extracted word count — the classic boilerplate-page signal (nav/
    footer link farms score high and get dropped).  One projection,
    zero shuffles; thresholds are the caller's business."""
    text = strip_html(html_col)
    n_links = F.regexp_count(F.col(html_col), F.lit(_HREF_RE)).cast("long")
    n_words = F.when(text == "", F.lit(0)).otherwise(
        F.size(F.split(text, " "))
    ).cast("long")
    return df.select(
        F.col(id_col),
        text.alias("text"),
        n_links.alias("n_links"),
        n_words.alias("n_words"),
        F.round(
            n_links.cast("double")
            / F.greatest(n_words.cast("double"), F.lit(1.0)),
            6,
        ).alias("link_density"),
    )
