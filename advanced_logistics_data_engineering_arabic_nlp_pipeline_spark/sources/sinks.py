"""Report sinks (SURVEY.md §2 A7).

The reference writes four analytics CSVs with utf-8-sig for Power BI
(Main.py:42-48, 544, 562). Spark-side: CSV with header for interchange,
parquet for anything downstream of this engine (columnar, typed, splittable
— CSV at 100 TB is an anti-pattern, so parquet is the default).

``single_file=True`` coalesces to one output part like the reference's
single CSV — only for small *reports* (the coalesce funnels through one
task; never do this to a fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_report_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("encoding", "UTF-8")
        .csv(path)
    )


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
