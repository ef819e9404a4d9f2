"""Date-range splitting (SURVEY §4): per-source window caps.

The reference splits query ranges to dodge API limits/sampling:
- GA4: 1-day granularity "to avoid sampling and API limits"
  (d2b_data/Google_GA4.py:230-273)
- TikTok: ≤30-day windows (time-series) / 365-day cap (lifetime)
  (d2b_data/tiktok_marketing.py:288-296,346-349)
- FB page insights: 90-day windows (legacy/FacebookOrganic.py:276)
- "Unsampled mode": force 1-day windows (Linkedin_Marketing.py:62-66)

The resulting (start, end) task list is the fan-out axis for parallel
fetch (see rest.py) — what the reference does serially, we map over
executors.
"""

from __future__ import annotations

from datetime import date, timedelta


def split_range(
    start: date | str,
    end: date | str,
    max_days: int = 1,
) -> list[tuple[str, str]]:
    """Split [start, end] (inclusive) into windows of ≤ ``max_days`` days.

    Returns ISO-string tuples (the connectors' wire format). max_days=1
    reproduces GA4 per-day splitting; 30 reproduces TikTok chunking
    (whose ``+29 days`` step this matches).
    """
    if isinstance(start, str):
        start = date.fromisoformat(start)
    if isinstance(end, str):
        end = date.fromisoformat(end)
    if end < start:
        raise ValueError(f"end {end} before start {start}")
    out = []
    cursor = start
    while cursor <= end:
        window_end = min(cursor + timedelta(days=max_days - 1), end)
        out.append((cursor.isoformat(), window_end.isoformat()))
        cursor = window_end + timedelta(days=1)
    return out


def cap_range(start: date | str, end: date | str, max_days: int = 365) -> tuple[str, str]:
    """Clamp a range to the trailing ``max_days`` window ending at ``end``
    (TikTok lifetime-mode 365-day cap)."""
    if isinstance(start, str):
        start = date.fromisoformat(start)
    if isinstance(end, str):
        end = date.fromisoformat(end)
    floor = end - timedelta(days=max_days - 1)
    return (max(start, floor).isoformat(), end.isoformat())


def default_window(today: date, days_back: int = 30) -> tuple[str, str]:
    """since = yesterday − days_back, until = yesterday (F8 —
    d2b_data/instagram_organic.py:458-480)."""
    yesterday = today - timedelta(days=1)
    return ((yesterday - timedelta(days=days_back)).isoformat(), yesterday.isoformat())
