"""Type-coercion Column functions (SURVEY.md §2 B2-B5).

Reference semantics (behavior studied at /root/reference, not copied):
- ints:    ``pd.to_numeric(errors='coerce').fillna(0).astype('int64')``
           (Main.py:367-370) → ``coalesce(try_cast(c AS BIGINT), 0)``
- floats:  same with 0.0 default (Main.py:372-373)
- times:   ``pd.to_datetime(errors='coerce')`` → ``try_to_timestamp`` (NULL on
           failure, Main.py:375-376)
- strings: ``fillna('').astype(str)`` → ``coalesce(cast string, '')``
           (Main.py:378-382; the pandas ``'nan'`` scrub is a pandas artifact —
           Spark never prints literal 'nan' for nulls)

All pure Column expressions — they stay inside whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coerce_long(c: Column | str, default: int = 0) -> Column:
    """pandas ``to_numeric`` routes mixed columns through float64, so
    ``'3.9'`` coerces to 3 (truncation toward zero), not NULL — mirror that:
    exact bigint cast first, then truncated double, then the default."""
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(
        c.try_cast("bigint"),
        c.try_cast("double").cast("bigint"),
        F.lit(default).cast("bigint"),
    )


def coerce_double(c: Column | str, default: float = 0.0) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(c.try_cast("double"), F.lit(default).cast("double"))


def coerce_timestamp(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.try_cast("timestamp")


def coerce_string(c: Column | str, default: str = "") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(c.cast("string"), F.lit(default))


def dsum(c: Column, scale: int = 6) -> Column:
    """Order-independent deterministic sum of a double column.

    Plain ``SUM(double)`` is non-associative: partition order changes the last
    ulps, which breaks cross-engine value-hash comparison and makes reruns
    non-reproducible. Casting to decimal first makes the sum exact and
    order-independent — the right call at 1000 executors, not just for tests.
    Result is cast back to DOUBLE for a stable output schema.
    """
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
