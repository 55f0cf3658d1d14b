"""Alert dispatch on pipeline failures.

Reference contract (cli/alert_sender.py + alert_handlers/*): a registry of
named handlers from config; on a failed tap run every configured handler
gets the message; unknown handler names raise at configuration time, not
failure time. Network handlers (slack/victorops webhooks) are deployment
concerns — the engine ships the dispatcher, a logging handler, and a
callable-registration seam so any webhook client plugs in without touching
the runner.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

LOGGER = logging.getLogger(__name__)

#: handler type name -> factory(config dict) -> callable(message: str)
HANDLER_TYPES: dict[str, Callable[[dict], Callable[[str], None]]] = {}


def register_handler_type(
    name: str,
) -> Callable[[Callable[[dict], Callable[[str], None]]], Any]:
    def deco(factory):
        HANDLER_TYPES[name] = factory
        return factory

    return deco


@register_handler_type("log")
def _log_handler(config: dict) -> Callable[[str], None]:
    level = logging.getLevelName(str(config.get("level", "ERROR")).upper())

    def send(message: str) -> None:
        LOGGER.log(level if isinstance(level, int) else logging.ERROR,
                   "ALERT: %s", message)

    return send


class AlertSender:
    """Dispatch failure messages to every configured handler."""

    def __init__(self, alert_handlers: dict[str, dict] | None = None):
        self._handlers: list[Callable[[str], None]] = []
        for name, config in (alert_handlers or {}).items():
            factory = HANDLER_TYPES.get(name)
            if factory is None:
                raise ValueError(
                    f"invalid alert handler type: {name!r} "
                    f"(registered: {sorted(HANDLER_TYPES)})"
                )
            self._handlers.append(factory(dict(config or {})))

    def add(self, handler: Callable[[str], None]) -> None:
        """Register an ad-hoc callable handler (tests, custom webhooks)."""
        self._handlers.append(handler)

    def send_to_all(self, message: str) -> int:
        """Best-effort fan-out; a failing handler never masks the original
        pipeline error. Returns the number of successful sends."""
        sent = 0
        for h in self._handlers:
            try:
                h(message)
                sent += 1
            except Exception:
                LOGGER.exception("alert handler failed")
        return sent
