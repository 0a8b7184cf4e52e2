"""Central query registry: merges every plan module's QUERIES/ORACLES.

``__spark_entry__.py`` re-exports from here; tests iterate it to check every
declared query against its DuckDB oracle locally before the driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import llmdata, relational, showcase, trips, windows

_PLAN_MODULES = [relational, trips, llmdata, windows, showcase]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _PLAN_MODULES:
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.ORACLES)
    return out
