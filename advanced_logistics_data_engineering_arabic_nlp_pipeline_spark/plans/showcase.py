"""Isolated-operator showcase queries closing SURVEY.md §2 line items that
the composite pipelines exercise only implicitly:

- A8  structure_raw_data: nested-record flattening + confirm_status gate
- B2-B5 defensive type coercion on deliberately messy inline values
- D1-D4 normalization intermediates on the golden corpus
- E1  tier-1 exact lookup as a *broadcast dim-table join* (the scale path
      for dictionaries too large to inline as a literal map)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import arabic
from ..functions.coercion import coerce_double, coerce_long, coerce_string
from ..operators.lookup import tier12_expr  # noqa: F401  (E2 sibling of the E1 join below)
from ..sources.dictionary import build_variant_index, dim_table, sql_tier1_case
from .trips import GOLDEN_TEXTS, trips_raw

# ── A8: structure_raw_data (Main.py:442-463) ────────────────────────────────
# Raw REST page rows with nested entry/station objects; rows whose
# confirm_status is not exactly true (false, NULL, missing) are dropped.

_RAW_RECORDS = [
    (101, True, "Ali", "2024-01-05", 250.0, (7,), ("ST-A",), "مطار القاهرة"),
    (102, False, "Mona", "2024-01-06", 120.0, (8,), ("ST-B",), "الهرم"),
    (103, None, "Omar", "2024-01-07", 80.0, (9,), ("ST-C",), "وسط البلد"),
    (104, True, "Sara", "bad-date", -10.5, (None,), (None,), ""),
    (105, True, None, None, None, (11,), ("ST-E",), None),
]

_RAW_SCHEMA = (
    "serialId bigint, confirm_status boolean, customer_name string, "
    "date string, sale_price double, entry struct<number: bigint>, "
    "station struct<name: string>, end_location string"
)


def structure_raw_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame(_RAW_RECORDS, _RAW_SCHEMA)
    return (
        raw.filter(F.col("confirm_status").eqNullSafe(True))
        .select(
            F.col("serialId").alias("#"),
            coerce_string(F.col("customer_name")).alias("customer_name"),
            F.date_format(F.col("date").try_cast("timestamp"), "yyyy-MM-dd").alias("date"),
            coerce_double(F.col("sale_price")).alias("sale_price"),
            F.col("entry.number").alias("entry_number"),
            coerce_string(F.col("station.name")).alias("station"),
            coerce_string(F.col("end_location")).alias("end_location"),
        )
        .orderBy("#")
    )


def _sql_raw_values() -> str:
    rows = []
    for sid, cs, name, date, price, entry, station, loc in _RAW_RECORDS:
        def s(v):  # noqa: E306
            return "NULL" if v is None else f"'{v}'"
        cs_sql = "NULL" if cs is None else str(cs).upper()
        price_sql = "NULL" if price is None else f"CAST({price} AS DOUBLE)"
        en = "NULL" if entry[0] is None else str(entry[0])
        st = s(station[0])
        rows.append(
            f"({sid}, {cs_sql}, {s(name)}, {s(date)}, {price_sql}, "
            f"{{'number': CAST({en} AS BIGINT)}}, {{'name': CAST({st} AS VARCHAR)}}, {s(loc)})"
        )
    return ",\n    ".join(rows)


STRUCTURE_RAW_TRIPS_SQL = f"""
WITH raw(serialId, confirm_status, customer_name, date, sale_price, entry, station, end_location) AS (
  VALUES
    {_sql_raw_values()}
)
SELECT serialId AS "#",
       COALESCE(customer_name, '') AS customer_name,
       strftime(TRY_CAST(date AS TIMESTAMP), '%Y-%m-%d') AS date,
       COALESCE(sale_price, 0.0) AS sale_price,
       entry.number AS entry_number,
       COALESCE(station.name, '') AS station,
       COALESCE(end_location, '') AS end_location
FROM raw
WHERE confirm_status IS TRUE
ORDER BY 1
"""


# ── B2-B5: coercion semantics on messy values ───────────────────────────────

_MESSY = ["42", "3.9", "-3.9", " 7 ", "x9", "", None, "1e3", "2024-01-05", "9999999999"]


def coercion_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame([(i, v) for i, v in enumerate(_MESSY)], "idx int, v string")
    return df.select(
        "idx",
        coerce_long(F.col("v")).alias("as_long"),
        F.round(coerce_double(F.col("v")), 6).alias("as_double"),
        F.date_format(F.col("v").try_cast("timestamp"), "yyyy-MM-dd").alias("as_date"),
        coerce_string(F.col("v")).alias("as_string"),
    ).orderBy("idx")


def _sql_messy_values() -> str:
    return ", ".join(
        f"({i}, " + ("NULL" if v is None else f"'{v}'") + ")" for i, v in enumerate(_MESSY)
    )


COERCION_SHOWCASE_SQL = f"""
WITH t(idx, v) AS (VALUES {_sql_messy_values()})
SELECT idx,
       -- double-path only: DuckDB TRY_CAST('3.9' AS BIGINT) *rounds* to 4,
       -- while Spark's bigint try_cast fails it; trunc(double) matches both
       -- Spark's fallback branch and pandas' float64 route
       COALESCE(CAST(trunc(TRY_CAST(v AS DOUBLE)) AS BIGINT), 0) AS as_long,
       ROUND(COALESCE(TRY_CAST(v AS DOUBLE), 0.0), 6) AS as_double,
       strftime(TRY_CAST(v AS TIMESTAMP), '%Y-%m-%d') AS as_date,
       COALESCE(v, '') AS as_string
FROM t
ORDER BY idx
"""


# ── D1-D4: normalization intermediates on the golden corpus ─────────────────

def golden_nlp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOLDEN_TEXTS)], "idx int, text string"
    )
    t = F.coalesce(F.col("text"), F.lit(""))  # align NULL handling across engines
    return df.select(
        "idx",
        arabic.normalize_arabic(t).alias("norm"),
        arabic.clean_text(t).alias("clean"),
        F.trim(arabic.strip_op_prefix(F.coalesce(t, F.lit("")))).alias("stripped"),
        F.array_join(arabic.tokenize_trip(arabic.scrub_round_trip(F.coalesce(t, F.lit("")))), " | ").alias(
            "tokens"
        ),
    ).orderBy("idx")


def _sql_golden_values() -> str:
    out = []
    for i, t in enumerate(GOLDEN_TEXTS):
        v = "NULL" if t is None else "'" + t.replace("'", "''") + "'"
        out.append(f"({i}, {v})")
    return ", ".join(out)


GOLDEN_NLP_FUNCTIONS_SQL = f"""
WITH t(idx, text) AS (VALUES {_sql_golden_values()})
SELECT idx,
       {arabic.sql_normalize("COALESCE(text, '')")} AS norm,
       {arabic.sql_clean_text("COALESCE(text, '')")} AS clean,
       trim({arabic.sql_strip_op_prefix("COALESCE(text, '')")}) AS stripped,
       COALESCE(array_to_string({arabic.sql_tokenize(arabic.sql_scrub_round_trip("COALESCE(text, '')"))}, ' | '), '') AS tokens
FROM t
ORDER BY idx
"""


# ── E1: tier-1 exact lookup as a broadcast dim-table join ───────────────────

def location_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-tier lookup as ``fact ⋈ broadcast(dim)`` — how the reverse
    index ships to 1000 executors when the dictionary outgrows a literal
    map. Tier-1 ONLY (no containment/fuzzy), isolating E1 semantics."""
    trips = trips_raw(spark, sf_dir)
    toks = arabic.tokenize_trip(
        arabic.scrub_round_trip(F.trim(F.coalesce(F.col("end_location"), F.lit(""))))
    )
    tokens = trips.select(F.explode(toks).alias("token")).withColumn(
        "norm", arabic.normalize_arabic(F.col("token"))
    )
    dim = dim_table(spark)
    return (
        tokens.join(F.broadcast(dim), tokens["norm"] == dim["variant_norm"], "inner")
        .groupBy("canonical")
        .agg(F.count("*").alias("n_hits"))
        .orderBy(F.desc("n_hits"), "canonical")
    )


def _location_lookup_join_sql() -> str:
    from .trips import _sql_master_stage  # reuse the raw CTE synth

    # rebuild just the raw→tokens part; tier-1 CASE gives the same canonical
    stage = _sql_master_stage()
    return (
        stage
        + f""",
tokens AS (
  SELECT unnest(toks) AS token FROM tok
),
resolved AS (
  SELECT {sql_tier1_case(arabic.sql_normalize("token"))} AS canonical
  FROM tokens
)
SELECT canonical, COUNT(*) AS n_hits
FROM resolved
WHERE canonical IS NOT NULL
GROUP BY canonical
ORDER BY n_hits DESC, canonical
"""
    )


QUERIES = {
    "structure_raw_trips": structure_raw_trips,
    "coercion_showcase": coercion_showcase,
    "golden_nlp_functions": golden_nlp_functions,
    "location_lookup_join": location_lookup_join,
}

ORACLES = {
    "structure_raw_trips": STRUCTURE_RAW_TRIPS_SQL,
    "coercion_showcase": COERCION_SHOWCASE_SQL,
    "golden_nlp_functions": GOLDEN_NLP_FUNCTIONS_SQL,
    "location_lookup_join": _location_lookup_join_sql(),
}
