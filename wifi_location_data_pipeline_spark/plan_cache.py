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


def emit(rearm: Callable[[], object]) -> None:
    """Record a callable that re-registers an interior persist point."""
    _SINK.append(rearm)


def drain() -> list[Callable[[], object]]:
    """Return and clear the callables emitted since the last drain."""
    out = list(_SINK)
    _SINK.clear()
    return out
