"""Registry ordering guarantees.

The driver's correctness gate covers only a prefix of ``queries()`` (50
entries in round 2); in that round 10 oracle-backed queries registered after
position 50 and silently lost their driver check.  These tests pin the fix:
every oracle-backed query must precede every rows-only query, so the
oracle-backed set always fits the driver's window as long as it holds at
most ``DRIVER_WINDOW`` entries.
"""

from __future__ import annotations

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry

DRIVER_WINDOW = 50


def test_oracle_backed_queries_fit_driver_window():
    names = list(registry.all_queries())
    oracles = set(registry.all_oracles())
    prefix = set(names[: len(oracles)])
    assert oracles <= prefix, sorted(oracles - prefix)
    assert len(oracles) <= DRIVER_WINDOW, (
        f"{len(oracles)} oracle-backed queries exceed the driver's "
        f"{DRIVER_WINDOW}-entry correctness window; tighten or split"
    )


def test_every_oracle_has_query():
    queries = registry.all_queries()
    dangling = set(registry.all_oracles()) - set(queries)
    assert not dangling, sorted(dangling)


def test_bench_headline_names_exist_in_registry():
    """A typo'd HEADLINE/STRESS name silently drops the query from the
    bench (`if n in queries` guard) — pin every name to the registry."""
    import bench

    queries = set(registry.all_queries())
    missing = [n for n in bench.HEADLINE + bench.STRESS if n not in queries]
    assert not missing, missing
