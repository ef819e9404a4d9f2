"""Retry / backoff policies (SURVEY §2.11 R1-R5).

The reference hand-rolls four backoff variants; here each is a declarative
policy object usable both driver-side (sequential cursor walks) and
executor-side (inside mapInPandas fetch tasks).

References:
- R1 exp backoff + jitter on {429,5xx}: d2b_data/Google_GA4.py:145-195,
  d2b_data/search_console.py:262-323
- R2 backoff w/o jitter; 429 aborts (daily quota):
  d2b_data/linkedin_organic.py:118-175
- R3 429-only backoff: d2b_data/tiktok_marketing.py:125-154
- R5 async-job polling: d2b_data/Facebook_Marketing.py:149-235
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from d2b_dataframework_spark.core.errors import (
    AsyncJobFailedError,
    QuotaExhaustedError,
    TransientAPIError,
)


@dataclass
class RetryPolicy:
    """Exponential backoff: sleep ``base ** attempt`` (+ jitter) on listed
    status codes, up to ``max_retries``; ``abort_codes`` raise
    QuotaExhaustedError immediately (daily-quota semantics)."""

    max_retries: int = 5
    retry_codes: frozenset[int] = frozenset({429, 500, 502, 503, 504})
    abort_codes: frozenset[int] = frozenset()
    base: float = 2.0
    jitter: bool = True
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)

    def delay(self, attempt: int) -> float:
        return self.base**attempt + (random.uniform(0, 1) if self.jitter else 0.0)

    def call(self, fn: Callable[[], object]):
        """Run ``fn``; on HTTPStatusError-like exceptions with a
        ``status_code`` attr, apply the policy."""
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001
                status = getattr(exc, "status_code", None)
                if status in self.abort_codes:
                    raise QuotaExhaustedError(str(exc)) from exc
                if status not in self.retry_codes or attempt == self.max_retries:
                    raise
                last = exc
                self.sleep(self.delay(attempt))
        raise TransientAPIError(str(last))  # pragma: no cover


# The reference's four concrete policies:
GOOGLE_POLICY = RetryPolicy(max_retries=5, retry_codes=frozenset({429, 500, 502, 503, 504}), jitter=True)
LINKEDIN_POLICY = RetryPolicy(
    max_retries=3,
    retry_codes=frozenset({500, 502, 503}),
    abort_codes=frozenset({429}),
    jitter=False,
)
TIKTOK_POLICY = RetryPolicy(max_retries=5, retry_codes=frozenset({429}), jitter=True)
TENACITY_POLICY = RetryPolicy(max_retries=3, retry_codes=frozenset(range(400, 600)), jitter=False)


@dataclass
class AsyncJobPoller:
    """Launch-and-poll for server-side report jobs (R5): ``launch`` up to
    ``max_launch_tries`` with backoff, then poll ``check`` every
    ``poll_interval`` s up to ``max_polls``; a terminal 'failed' status
    raises AsyncJobFailedError."""

    max_launch_tries: int = 10
    poll_interval: float = 20.0
    max_polls: int = 60
    initial_wait: float = 10.0
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)

    def run(
        self,
        launch: Callable[[], object],
        check: Callable[[object], str],
        fetch: Callable[[object], object],
    ):
        job = None
        for attempt in range(self.max_launch_tries):
            try:
                job = launch()
                break
            except Exception:  # noqa: BLE001
                if attempt == self.max_launch_tries - 1:
                    raise
                self.sleep(2.0**attempt)
        self.sleep(self.initial_wait)
        for _ in range(self.max_polls):
            status = check(job)
            if status == "completed":
                return fetch(job)
            if status == "failed":
                raise AsyncJobFailedError("async report job failed")
            self.sleep(self.poll_interval)
        raise TransientAPIError("async job polling budget exhausted")
