"""Observability: leveled logging + critical-alert webhook (SURVEY §2.11
R8) and Spark job-failure hooks (R8/R9 glue).

Reference semantics (d2b_data/verbose_logger.py:15-32,
d2b_data/workflow_logger.py:91-135):

- ``Verbose``/``WorkflowLogger`` wrap print/stdlib logging; ``critical``
  additionally POSTs ``{"message": ...}`` to a Cloud-Function-style
  webhook with a 15 s timeout; webhook failures are swallowed (an alert
  must never take the pipeline down).

Spark mapping: the logger is driver-side; ``alert_on_failure`` wraps a
job action so stage/task failures trigger the same critical path the
reference fires on connector errors.
"""

from __future__ import annotations

import logging

WEBHOOK_TIMEOUT_S = 15.0  # verbose_logger.py:24


class AlertLogger:
    """Stdlib logger + webhook escalation on ``critical`` (R8).

    ``transport`` is injected (same contract as connectors:
    ``post(url, body)``) so tests and offline runs use FakeTransport;
    None disables escalation (the reference's no-webhook mode).
    """

    def __init__(
        self,
        name: str = "d2b_dataframework_spark",
        webhook_url: str | None = None,
        transport=None,
        verbose: bool = True,
    ):
        self.logger = logging.getLogger(name)
        self.webhook_url = webhook_url
        self.transport = transport
        self.verbose = verbose

    def info(self, message: str) -> None:
        if self.verbose:
            self.logger.info(message)

    def warning(self, message: str) -> None:
        self.logger.warning(message)

    def error(self, message: str) -> None:
        self.logger.error(message)

    def critical(self, message: str) -> None:
        """Log + webhook POST {'message': ...}; webhook errors are
        swallowed (verbose_logger.py:26-32)."""
        self.logger.critical(message)
        if self.webhook_url and self.transport is not None:
            try:
                self.transport.post(self.webhook_url, {"message": message})
            except Exception:  # noqa: BLE001 — alerting must not raise
                self.logger.error("alert webhook delivery failed")


def alert_on_failure(logger: AlertLogger, description: str):
    """Decorator: run a job action; on ANY failure fire the critical
    alert (with the failure summary) and re-raise — the reference's
    try/alert/raise pattern around each workflow step
    (workflow_logger.py:91-135)."""

    def wrap(fn):
        def run(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception as exc:
                logger.critical(f"{description} failed: {exc}")
                raise

        return run

    return wrap
