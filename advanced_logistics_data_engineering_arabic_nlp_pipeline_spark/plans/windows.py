"""Event-time window analytics over ``events`` (SURVEY.md §2 L batch forms
+ §2 I window functions). The same expressions run under Structured
Streaming (see ..streaming.pipeline); here they're exercised in batch so the
DuckDB oracle can check values.

Oracle notes: events.ts is nanosecond parquet; both engines truncate to
microseconds (Spark via nanosAsLong div 1000, DuckDB via CAST(ts AS
TIMESTAMP)) so boundaries agree exactly. Window starts are emitted as
strings to keep the comparison representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.coercion import dsum
from ..sources.tables import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_HOURLY_SQL = f"""
SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '{_DUCK_FMT}') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows every hour: each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal total; rounding a double *quotient* is engine-
            # representation-dependent at scale boundaries, so no avg here
            dsum(F.col("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


EVENTS_SLIDING_SQL = f"""
WITH assigned AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value FROM events
  UNION ALL
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR AS h, value FROM events
)
SELECT strftime(h, '{_DUCK_FMT}') AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM assigned
GROUP BY h
ORDER BY 1
"""


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap
    (Structured Streaming's session_window, run in batch)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            F.date_format("w.end", _FMT).alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# gaps-and-islands mirror: a new session starts when the gap is >= 10 min
# (session windows are [start, last+gap) half-open); session end = last+gap
EVENTS_SESSIONS_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
l AS (
  SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM e
),
g AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
  FROM l
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
)
SELECT user_id,
       strftime(MIN(ts), '{_DUCK_FMT}') AS session_start,
       strftime(MAX(ts) + INTERVAL 10 MINUTE, '{_DUCK_FMT}') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, sess
ORDER BY user_id, session_start
"""


def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered window function (running sum per user) — the window-op gap
    the reference never had (SURVEY.md §2 I)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # decimal-cast INSIDE the window sum: a raw double prefix sum is
    # association-order dependent (Spark accumulates sequentially, DuckDB
    # uses a segment tree), so a sum landing within an ulp of a …5
    # boundary could round differently per engine — the dsum discipline
    # applied to the running frame
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double"), 6
        ).alias("running_value"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).cast("bigint").alias("event_seq"),
    ).orderBy("user_id", "event_seq")


USER_RUNNING_TOTALS_SQL = """
SELECT event_id,
       user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6)))
                  OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS running_value,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS event_seq
FROM events
ORDER BY user_id, event_seq
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (G4's inverse): per-day event counts, one column per type.
    Explicit pivot values keep the output schema static — mandatory at
    scale (a dynamic pivot scans the data twice to discover columns)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    return (
        ev.groupBy(day)
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
        .orderBy("day")
    )


EVENTS_DAILY_PIVOT_SQL = f"""
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "events_hourly": events_hourly,
    "events_daily_pivot": events_daily_pivot,
    "events_sliding": events_sliding,
    "events_sessions": events_sessions,
    "user_running_totals": user_running_totals,
}

ORACLES = {
    "events_hourly": EVENTS_HOURLY_SQL,
    "events_daily_pivot": EVENTS_DAILY_PIVOT_SQL,
    "events_sliding": EVENTS_SLIDING_SQL,
    "events_sessions": EVENTS_SESSIONS_SQL,
    "user_running_totals": USER_RUNNING_TOTALS_SQL,
}
