"""Re-arm collection point for the service-query plan cache.

``plans.queries.QueryDef.service`` reuses ANALYZED DataFrames across
invocations (the reference's positioning service compiles its dataflow once
at Spring startup). Some builders install interior ``cache()`` points whose
registration is dropped by ``spark.catalog.clearCache()``; re-executing the
reused plan without them would re-collapse the protected expression tree
(see positioning/onepass.py). Builders emit the re-registration callables
here; QueryDef drains them at build time and replays them on cache hits.
"""

from __future__ import annotations

from collections.abc import Callable

_SINK: list[Callable[[], object]] = []
_COLLECTING: bool = False


def begin() -> None:
    """Open a collection window (QueryDef service-plan build in progress)."""
    global _COLLECTING
    _SINK.clear()
    _COLLECTING = True


def emit(rearm: Callable[[], object]) -> None:
    """Record a callable that re-registers an interior persist point.

    No-op outside a collection window: long-running callers that invoke the
    builders directly (e.g. the streaming positioning loop, one call per
    micro-batch) must not grow a global list that nothing drains.
    """
    if _COLLECTING:
        _SINK.append(rearm)


def drain() -> list[Callable[[], object]]:
    """Return and clear the callables emitted since ``begin()``; close the window."""
    global _COLLECTING
    out = list(_SINK)
    _SINK.clear()
    _COLLECTING = False
    return out
