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

import os

from pyspark.sql import DataFrame

UTF8_BOM = b"\xef\xbb\xbf"


def write_report_csv(
    df: DataFrame, path: str, single_file: bool = True, bom: bool = True
) -> None:
    """CSV report writer. ``bom=True`` (the default, matching the reference's
    ``utf-8-sig``, Main.py:544/562) prepends the UTF-8 BOM to the single
    output part so Excel/Power BI detect the encoding and Arabic columns
    don't mojibake. Spark's CSV writer can't emit a BOM itself, so it's
    prepended driver-side — only valid for ``single_file`` reports (a
    sharded fact extract must NOT get a BOM per part)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("encoding", "UTF-8")
        .csv(path)
    )
    if bom and single_file:
        for name in os.listdir(path):
            if name.startswith("part-") and name.endswith(".csv"):
                p = os.path.join(path, name)
                with open(p, "rb") as f:
                    data = f.read()
                if not data.startswith(UTF8_BOM):
                    with open(p, "wb") as f:
                        f.write(UTF8_BOM + data)
                    # the Hadoop local FS wrote a checksum sidecar for the
                    # original bytes; drop it or re-reads fail CRC
                    crc = os.path.join(path, f".{name}.crc")
                    if os.path.exists(crc):
                        os.remove(crc)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink — same layout contract as :func:`write_parquet` for
    deployments standardized on ORC (both are columnar, splittable,
    predicate-pushdown-capable; the engine is format-agnostic downstream
    of the DataFrame)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format of the reference's landing
    pages (sources/landing.py reads the same shape back), for handing rows
    to non-columnar consumers. Never the analytics format at scale."""
    df.write.mode("overwrite").json(path)
