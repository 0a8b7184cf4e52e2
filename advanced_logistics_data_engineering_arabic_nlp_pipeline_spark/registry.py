"""Central query registry: merges every plan module's QUERIES/ORACLES.

``__spark_entry__.py`` re-exports from here; tests iterate it to check every
declared query against its DuckDB oracle locally before the driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import llmdata, mixture, relational, showcase, trips, windows

# mixture LAST: its queries are all LOCAL_ORACLES (rows-only to the driver),
# and trailing module order keeps them at the registry tail — the driver's
# 50-entry window (48 oracles + the first 2 rows-only entries) is unchanged.
_PLAN_MODULES = [relational, trips, llmdata, windows, showcase, mixture]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Merged registry, ordered oracle-backed first, rows-only last.

    The driver's correctness run covers a fixed-size prefix of this dict (50
    entries in round 2), so every query with a DuckDB oracle must register
    before the ``no_oracle`` rows-only entries or it silently loses its
    driver check.  Ordering here (instead of by module shuffling) keeps the
    guarantee stable as queries are added; tests/test_registry.py pins it.
    """
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _PLAN_MODULES:
        overlap = set(merged) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    oracles = all_oracles()
    out = {n: f for n, f in merged.items() if n in oracles}
    out.update({n: f for n, f in merged.items() if n not in oracles})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.ORACLES)
    return out


def local_oracles() -> dict[str, str]:
    """Oracles checked by pytest only — queries whose driver-window slot was
    deliberately freed (duplicate/thin oracle twins). Full hash parity still
    runs locally (tests/test_oracle_parity.py); the driver sees them as
    rows-only. Disjoint from :func:`all_oracles` by construction."""
    out: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        out.update(getattr(mod, "LOCAL_ORACLES", {}))
    overlap = set(out) & set(all_oracles())
    if overlap:
        raise ValueError(f"queries in both ORACLES and LOCAL_ORACLES: {overlap}")
    return out
