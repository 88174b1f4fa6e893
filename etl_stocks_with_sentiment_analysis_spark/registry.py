"""Query registry: SURVEY.md §2 key → (Spark callable, DuckDB oracle SQL).

Every operator module registers its public queries here with the
stable §2 key. ``__spark_entry__`` exposes the registry to the
driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    key: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as the Spark implementation of ``key``."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = QueryDef(key, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: d.fn for k, d in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: d.oracle for k, d in sorted(_REGISTRY.items()) if d.oracle is not None}


def get(key: str) -> QueryDef:
    _ensure_loaded()
    return _REGISTRY[key]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import operators  # noqa: F401  (imports submodules for side effects)
    from . import llmdata  # noqa: F401
    from . import ml  # noqa: F401
    from . import streaming  # noqa: F401
    from . import plans  # noqa: F401  (quality suite)

    _LOADED = True
