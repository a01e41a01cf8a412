"""Plan-regime decision log: which physical strategy a query chose, and why.

Size-gated operators (join_3way's staged cutover, auto_join/auto_agg skew
cutovers) pick between plan shapes from Catalyst size stats at build time.
That decision is invisible in a wall-clock number — a bench record showing
join_3way at 50 s can't say whether the staged plan ran or the gate failed
to engage. Operators call ``record(**kv)`` when they decide; the bench
harness drains the log per query and stamps the decisions into the bench
JSON, so a scale claim ("staged plan, 2.2 GB shuffle") and the committed
artifact can be checked against each other (round-4 verdict's one `weak`
was exactly this ambiguity).

Driver-side only, in-memory, never read by query plans — pure provenance.
"""

from __future__ import annotations

from contextvars import ContextVar
from typing import Any

_CURRENT_QUERY: ContextVar[str | None] = ContextVar("hdw_current_query",
                                                    default=None)

# decisions since the last drain(): {query_name: {key: value}}
_LOG: dict[str, dict[str, Any]] = {}


def set_current_query(name: str | None):
    """Mark the query whose builder is running (the catalog decorator
    does this). Returns the reset token."""
    return _CURRENT_QUERY.set(name)


def reset_current_query(token) -> None:
    _CURRENT_QUERY.reset(token)


def record(**kv: Any) -> None:
    """Attach decision facts to the query currently being built.
    Outside a catalog build (direct operator use) records under
    '<anonymous>' so nothing is silently dropped."""
    name = _CURRENT_QUERY.get() or "<anonymous>"
    _LOG.setdefault(name, {}).update(kv)


def drain() -> dict[str, dict[str, Any]]:
    """Return and clear all recorded decisions."""
    global _LOG
    out, _LOG = _LOG, {}
    return out
