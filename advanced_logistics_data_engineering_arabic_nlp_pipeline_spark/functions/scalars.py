"""Scalar derived-column functions (SURVEY.md §2 C1-C5).

Pure Column expressions (whole-stage-codegen friendly, SQL-mirrorable):

- C1 ``conditional_distance``: Total_KM = (km_return - km_start) when
  km_start > 0 and km_return > km_start else 0  (Main.py:388-390).
- C2 ``extract_plate``: strip non-digits, lstrip zeros, 'No Plate' if empty
  (Main.py:392-397).
- C3 ``us_date_string``: timestamp → "M/D/YYYY" with no zero padding, '' for
  null (Main.py:399-402). ``date_format`` pads, so we concat the parts.
- C4 ``route_string``: join non-null locations with ' → ' (Main.py:298-305).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def conditional_distance(km_start: Column, km_return: Column) -> Column:
    return (
        F.when((km_start > 0) & (km_return > km_start), (km_return - km_start).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
    )


def extract_plate(c: Column) -> Column:
    digits = F.regexp_replace(F.regexp_replace(c.cast("string"), r"\D", ""), "^0+", "")
    return F.when(digits == "", F.lit("No Plate")).otherwise(digits)


def sql_extract_plate(expr: str) -> str:
    """DuckDB mirror of :func:`extract_plate` — ONE generator for every
    oracle that needs the plate rule (customer_plates, trips_master), so a
    semantics change (e.g. Arabic-Indic digit support) lands in all
    mirrors at once instead of two hand-synced SQL copies."""
    digits = f"regexp_replace(regexp_replace({expr}, '\\D', '', 'g'), '^0+', '')"
    return f"CASE WHEN {digits} = '' THEN 'No Plate' ELSE {digits} END"


def us_date_string(ts: Column) -> Column:
    return F.when(
        ts.isNotNull(),
        F.concat_ws("/", F.month(ts), F.dayofmonth(ts), F.year(ts)),
    ).otherwise(F.lit(""))


def route_string(locs: Column) -> Column:
    """' → '-joined non-null, non-empty elements of an array column."""
    return F.array_join(F.filter(locs, lambda x: x.isNotNull() & (x != "")), " → ")
