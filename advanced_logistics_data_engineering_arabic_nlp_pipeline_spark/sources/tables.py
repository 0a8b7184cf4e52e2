"""Parquet table sources for the driver fixture schema (TESTDATA.md).

Reading is declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown, column pruning and partition pruning for free — at 100 TB the same
code reads a partitioned table directory and scans only the needed columns
(verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (they grow
# sub-linearly or not at all in TPC-H-style schemas).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

# Below this row count a single-task scan is fine; above it, an
# under-parallelized scan serializes every downstream pipelined operator.
# The threshold is deliberately low: per-row work varies by orders of
# magnitude (documents feed shingling / 64-hash aggregates, embeddings
# feed pairwise-cosine pipelines), so even a few thousand rows on one
# task can dominate a query's wall-time.
_MIN_ROWS_FOR_SCAN_REBALANCE = 2_000


def _scan_splits(sf_dir: str, name: str) -> tuple[int, int]:
    """(row_groups, rows) from the parquet footer — the maximum scan
    parallelism Spark can extract from the file without a shuffle."""
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet"))
        return f.num_row_groups, f.metadata.num_rows
    except Exception:
        return (1 << 30, 0)  # unknown: assume splittable, skip rebalance


def _rebalanced(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Repartition a fact table whose file layout cannot feed the session's
    parallelism (few row groups, e.g. the single-row-group test fixtures —
    Spark splits parquet by byte ranges, but every range maps into the one
    row group, so the whole scan→join→partial-agg pipeline runs as ONE
    task). The shuffle moves only the pruned columns and is skipped
    entirely when the footer shows enough row groups — at production scale
    (many files × many row groups) this is a no-op by construction."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    groups, rows = _scan_splits(sf_dir, name)
    if groups >= max(cores // 2, 1) or rows < _MIN_ROWS_FOR_SCAN_REBALANCE:
        return df
    return df.repartition(cores)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Deterministic timestamp semantics are an ENGINE INVARIANT (every plan
    # and oracle assumes UTC at execution time), so a foreign session's
    # zone is overridden — deliberately NOT scope-restored, because the
    # zone matters when downstream actions run, not at load. get_spark
    # sessions already carry UTC; warn when this actually flips something
    # so a caller's explicit non-UTC choice never changes silently.
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        import warnings

        warnings.warn(
            "load_table sets spark.sql.session.timeZone=UTC for the session"
            " (engine-wide determinism contract; see session.py)",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects — read as nanos-since-epoch under the
        # legacy conf and convert) and as TIMESTAMP(MICROS, NTZ). Branch on
        # the type actually read so either fixture vintage yields the same
        # session-UTC TimestampType column. The legacy conf is consulted at
        # schema resolution (the eager read below), so it is scope-restored
        # — left set, it silently turned every LATER nanos-timestamp
        # parquet read session-wide into bigint columns.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _rebalanced(df, sf_dir, name)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name in BROADCAST_DIMS:
        return df
    return _rebalanced(df, sf_dir, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
