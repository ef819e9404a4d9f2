"""Paginator strategies (SURVEY §2.1/§4): every pagination scheme the
reference's connectors use, behind one iterator interface.

Each paginator is a generator of page payloads given a ``fetch_page``
callable; the transport (HTTP client or test fake) is injected. Offset-
and page-number paginators are *fan-out-able* (page boundaries are known
up front → executors fetch pages in parallel); cursor/link paginators are
inherently serial (next key comes from the previous response) and stay on
the driver, yielding row batches that become DataFrame partitions.

References:
- offset (GA4, 250k/page):       d2b_data/Google_GA4.py:275-317
- startRow (GSC, 25k/page):      d2b_data/search_console.py:325-392
- page-number (TikTok, Alodesk): d2b_data/tiktok_marketing.py:353-438,
                                 d2b_data/Alodesk_API.py:65-91
- cursor (Graph API):            d2b_data/facebook_organic.py:113-154
- Link header (Shopify):         d2b_data/shopify_api.py:85-94
- pageToken (YouTube):           d2b_data/youtube_public.py:184-218
- newest-first early stop:       d2b_data/linkedin_organic.py:233-319
"""

from __future__ import annotations

from collections.abc import Callable, Iterator


def offset_pages(
    fetch: Callable[[int, int], list],
    page_size: int = 250_000,
    max_pages: int | None = None,
) -> Iterator[list]:
    """Offset pagination: request rows [offset, offset+page_size) until a
    short page arrives (GA4 semantics)."""
    offset, n = 0, 0
    while max_pages is None or n < max_pages:
        rows = fetch(offset, page_size)
        if rows:
            yield rows
        if len(rows) < page_size:
            return
        offset += page_size
        n += 1


def page_number_pages(
    fetch: Callable[[int], tuple[list, int]],
    start_page: int = 1,
) -> Iterator[list]:
    """Page-number pagination: ``fetch(page) -> (rows, total_pages)``
    (TikTok ``page_info.total_page`` semantics)."""
    page = start_page
    rows, total_pages = fetch(page)
    if rows:
        yield rows
    while page - start_page + 1 < total_pages:
        page += 1
        rows, total_pages = fetch(page)
        if rows:
            yield rows


def cursor_pages(
    fetch: Callable[[str | None], tuple[list, str | None]],
) -> Iterator[list]:
    """Cursor pagination: ``fetch(cursor) -> (rows, next_cursor)`` until
    next_cursor is None or the page is empty (Graph API semantics)."""
    cursor: str | None = None
    while True:
        rows, cursor = fetch(cursor)
        if rows:
            yield rows
        if not rows or cursor is None:
            return


def link_pages(
    fetch: Callable[[str | None], tuple[list, str | None]],
) -> Iterator[list]:
    """RFC-5988 ``Link: next`` pagination (Shopify) — same shape as a
    cursor walk, the cursor being the full next-page URL."""
    yield from cursor_pages(fetch)


def early_stop_pages(
    fetch: Callable[[int], list],
    stop_predicate: Callable[[dict], bool],
    page_size: int = 50,
) -> Iterator[list]:
    """Newest-first scan with early termination: stop paging entirely at
    the first row matching ``stop_predicate`` (rows after it are older —
    LinkedIn posts semantics); rows before the stop row in the same page
    are still yielded."""
    start = 0
    while True:
        rows = fetch(start)
        if not rows:
            return
        out = []
        for row in rows:
            if stop_predicate(row):
                if out:
                    yield out
                return
            out.append(row)
        yield out
        if len(rows) < page_size:
            return
        start += page_size


def batched_keys(keys: list, batch_size: int = 50) -> Iterator[list]:
    """Keyed batch lookup slicing (YouTube 50-id batches,
    youtube_public.py:243-249)."""
    for i in range(0, len(keys), batch_size):
        yield keys[i : i + batch_size]
