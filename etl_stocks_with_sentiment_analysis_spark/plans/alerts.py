"""Pluggable alert delivery — the engine-side analog of the
reference's DAG notification callbacks.

The reference posts Slack / PagerDuty / Teams webhooks on task
failure, DAG success, and SLA miss (reference
`airflow/utils/alerts.py:64-172`: each callback formats a payload and
POSTs it; PagerDuty events carry a `dedup_key` so retried failures
collapse to one incident). This engine already had the DETECTION half
(`events_error_rate_alert`, operators/analytics.py — the SQL-exact
daily error-rate condition); this module is the DELIVERY half,
deliberately network-free: alerts fan out to REGISTERED CALLABLES.
In a networked deployment a webhook sink is three lines
(`lambda ev: urlopen(Request(url, json.dumps(ev.payload())...))`) —
the shape `_send_webhook` has in the reference — and plugs in through
the same registry; the sandbox ships a logging sink and a JSONL file
sink instead.

Semantics mirrored from the reference:

- per-sink fault isolation: one failing sink never blocks the others
  (the reference returns False and logs on webhook errors);
- dedup by `dedup_key` (PagerDuty semantics): an already-delivered
  key is not re-delivered within the process;
- failure/success callbacks: the `alerting(source)` context manager
  is the library analog of `on_failure_callback`/
  `on_success_callback` — it emits a `failure` alert (with the
  exception summary) when the body raises, `success` otherwise.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

__all__ = [
    "AlertEvent",
    "register_alert_sink",
    "unregister_alert_sink",
    "emit_alert",
    "emit_frame_alerts",
    "alerting",
    "log_sink",
    "file_sink",
    "reset_dedup",
]


@dataclass(frozen=True)
class AlertEvent:
    kind: str  # "failure" | "success" | "sla_miss" | "threshold"
    source: str  # pipeline / query key / table the alert is about
    summary: str
    severity: str = "error"
    details: dict = field(default_factory=dict)
    dedup_key: str | None = None

    def payload(self) -> dict:
        """The JSON-ready dict a webhook sink would POST (the
        reference's `_format_task_context` + payload shape)."""
        return {
            "kind": self.kind,
            "source": self.source,
            "summary": self.summary,
            "severity": self.severity,
            "details": dict(self.details),
            "dedup_key": self.dedup_key,
        }


_SINKS: dict[str, object] = {}
_SEEN_DEDUP: set[str] = set()
_LOCK = threading.Lock()


def register_alert_sink(name: str, fn) -> None:
    """Register a delivery callable ``fn(event: AlertEvent) -> None``
    under `name` (replaces any previous sink of that name)."""
    with _LOCK:
        _SINKS[name] = fn


def unregister_alert_sink(name: str) -> None:
    with _LOCK:
        _SINKS.pop(name, None)


def reset_dedup() -> None:
    """Forget delivered dedup keys (tests; or a new incident epoch)."""
    with _LOCK:
        _SEEN_DEDUP.clear()


def emit_alert(event: AlertEvent) -> int:
    """Deliver `event` to every registered sink. Returns the number
    of sinks that received it (0 when deduplicated or no sinks are
    registered — mirroring the reference's skip-when-unconfigured).
    Per-sink errors are logged and isolated, never raised."""
    with _LOCK:
        sinks = list(_SINKS.items())
        if event.dedup_key is not None and event.dedup_key in _SEEN_DEDUP:
            return 0
    delivered = 0
    for name, fn in sinks:
        try:
            fn(event)
            delivered += 1
        except Exception as e:  # noqa: BLE001 - delivery isolation
            logger.error("alert sink %r failed: %s", name, e)
    if not sinks:
        logger.warning(
            "no alert sinks registered, dropping %s alert for %s",
            event.kind,
            event.source,
        )
    if event.dedup_key is not None and delivered > 0:
        # dedup is only consumed once at least one sink ACCEPTED the
        # event — an alert dropped for lack of sinks, or whose every
        # delivery failed (disk full, webhook down), stays deliverable
        # on retry. Check-then-record means two concurrent emitters of
        # the same key can both deliver (at-least-once, the PagerDuty
        # model — the receiving side collapses on dedup_key too).
        with _LOCK:
            _SEEN_DEDUP.add(event.dedup_key)
    return delivered


def log_sink(event: AlertEvent) -> None:
    """Built-in sink: the logging analog of a chat webhook."""
    logger.warning("[ALERT %s/%s] %s: %s", event.severity, event.kind,
                   event.source, event.summary)


def file_sink(path: str):
    """Built-in sink factory: append alerts as JSON lines — the
    durable local stand-in for a webhook endpoint."""

    def _sink(event: AlertEvent) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(event.payload()) + "\n")

    return _sink


def emit_frame_alerts(
    df,
    flag_col: str,
    source: str,
    summary_fmt: str,
    kind: str = "threshold",
    severity: str = "error",
    dedup_cols: tuple[str, ...] = (),
    max_alerts: int = 1000,
) -> int:
    """Bridge a DETECTION frame to delivery: collect the rows where
    `flag_col` is true (bounded: detection frames are post-aggregation
    — one row per day/group — and `max_alerts` hard-caps the collect)
    and emit one alert per row. `summary_fmt` is `str.format`-ed with
    the row's columns; `dedup_cols` build the dedup key.

    Example over the existing detection key::

        frame = events_error_rate_alert(spark, sf_dir)
        emit_frame_alerts(frame, "is_alert", "events_error_rate",
                          "error rate {err_bp} bp on {day}",
                          dedup_cols=("day",))
    """
    from pyspark.sql import functions as F

    rows = df.filter(F.col(flag_col)).limit(max_alerts + 1).collect()
    if len(rows) > max_alerts:
        logger.error(
            "emit_frame_alerts(%s): more than %d alert rows — "
            "truncated; aggregate the detection frame coarser",
            source,
            max_alerts,
        )
        rows = rows[:max_alerts]
    n = 0
    for r in rows:
        d = r.asDict()
        dedup = (
            "|".join([source] + [str(d[c]) for c in dedup_cols])
            if dedup_cols
            else None
        )
        n += (
            emit_alert(
                AlertEvent(
                    kind=kind,
                    source=source,
                    summary=summary_fmt.format(**d),
                    severity=severity,
                    details={k: str(v) for k, v in d.items()},
                    dedup_key=dedup,
                )
            )
            > 0
        )
    return n


class alerting:
    """Failure/success callback scope — the library analog of the
    reference's `on_failure_callback` / `on_success_callback`::

        with alerting("daily_enrichment"):
            run_pipeline(...)

    Emits a `failure` alert (exception class + message, like the
    reference's truncated traceback block) when the body raises —
    and re-raises; a `success` alert on clean exit."""

    def __init__(self, source: str, notify_success: bool = True):
        self.source = source
        self.notify_success = notify_success
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.monotonic()
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        wall = round(time.monotonic() - self._t0, 3)
        if exc is not None:
            emit_alert(
                AlertEvent(
                    kind="failure",
                    source=self.source,
                    summary=f"{exc_type.__name__}: {str(exc)[:500]}",
                    severity="error",
                    details={"wall_s": str(wall)},
                )
            )
            return False  # re-raise
        if self.notify_success:
            emit_alert(
                AlertEvent(
                    kind="success",
                    source=self.source,
                    summary=f"completed in {wall}s",
                    severity="info",
                )
            )
        return False
