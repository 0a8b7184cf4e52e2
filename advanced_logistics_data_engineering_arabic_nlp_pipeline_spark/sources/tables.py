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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # deterministic timestamp semantics regardless of the caller session's
    # JVM default zone (date parts must match the oracle's naive timestamps)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects — read as nanos-since-epoch under the
        # legacy conf and convert) and as TIMESTAMP(MICROS, NTZ). Branch on
        # the type actually read so either fixture vintage yields the same
        # session-UTC TimestampType column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
