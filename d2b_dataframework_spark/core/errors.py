"""Engine error types, mirroring the reference's failure taxonomy."""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine errors."""


class QuotaExhaustedError(EngineError):
    """Daily API quota exhausted — retrying is pointless until reset.

    Mirrors reference d2b_data/linkedin_organic.py:153-158 (HTTP 429 on a
    daily-quota API aborts instead of backing off).
    """


class TransientAPIError(EngineError):
    """Retryable upstream failure (HTTP 5xx / 429-with-reset)."""


class AsyncJobFailedError(EngineError):
    """A server-side async report job ended in a failed state.

    Mirrors reference d2b_data/Facebook_Marketing.py:214-218.
    """


class SchemaValidationError(EngineError):
    """Requested columns/types don't match the available schema.

    Mirrors reference d2b_data/youtube_public.py:84-121 (unknown column →
    ValueError listing what is available).
    """
