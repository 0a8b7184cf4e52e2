"""Paginated-source landing pattern (SURVEY.md §2 A1-A5).

The reference fetches a paginated REST API with retries, pickles page
batches, and tracks a progress file for crash resume (Main.py:109-208,
330-357, 466-518). The Spark-native shape splits that into:

1. a driver-side *lander* that pulls pages through an injected fetcher and
   writes them as JSON lines into a landing directory, with a ``progress.json``
   high-watermark for resume (idempotent per page-file);
2. Spark reading the landing dir — batch (``read_landing``) or streaming
   (``stream_landing``), where Structured Streaming's checkpoint replaces the
   reference's pickle batches entirely: offsets + sink state give
   exactly-once without custom code.

The fetcher is injected (no network in tests; a real deployment passes a
requests-backed callable). Retry policy mirrors the reference's
``robust_api_call`` (bounded attempts, linear-capped backoff).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

PageFetcher = Callable[[int], list[dict]]


def _progress_path(out_dir: str) -> str:
    return os.path.join(out_dir, "progress.json")


def load_progress(out_dir: str) -> dict:
    try:
        with open(_progress_path(out_dir), encoding="utf-8") as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"current_page": 0, "total_records": 0, "status": "new"}


def save_progress(out_dir: str, progress: dict) -> None:
    tmp = _progress_path(out_dir) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(progress, f)
    os.replace(tmp, _progress_path(out_dir))


def robust_call(fn: Callable[[], list[dict]], max_attempts: int = 5, backoff: float = 0.1):
    """Bounded-retry wrapper (Main.py:185-208 semantics; backoff capped)."""
    last: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — fetcher failures are retryable by contract
            last = exc
            if attempt < max_attempts:  # no dead wait after the final failure
                time.sleep(min(backoff * attempt, 5.0))
    raise RuntimeError(f"fetch failed after {max_attempts} attempts") from last


def _write_page(out_dir: str, page: int, rows: list[dict]) -> None:
    path = os.path.join(out_dir, f"page_{page:06d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    os.replace(tmp, path)


def land_pages(
    fetch_page: PageFetcher,
    out_dir: str,
    max_pages: int | None = None,
    max_attempts: int = 5,
    max_workers: int = 5,
    batch_size: int = 5,
) -> int:
    """Pull page batches concurrently from the resume point; write each page
    as ``page_{n:06d}.json`` (JSON lines, idempotent overwrite), keep
    ``progress.json`` current. Stops after a batch whose pages came back
    empty and whose last page is empty (Main.py:489-511 semantics:
    ``max_workers=5`` over ``batch_size=5`` pages per round). Returns total
    records landed this run."""
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    progress = load_progress(out_dir)
    page = int(progress.get("current_page", 0))
    landed = 0
    keep_fetching = True
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        while keep_fetching:
            batch_pages = [
                p
                for p in range(page, page + batch_size)
                if max_pages is None or p < max_pages
            ]
            if not batch_pages:
                break
            results = list(
                pool.map(
                    lambda p: robust_call(lambda: fetch_page(p), max_attempts),
                    batch_pages,
                )
            )
            # Land ONLY the contiguous non-empty prefix. Writing pages
            # beyond the first empty page counted their rows into `landed`
            # and progress.total_records without advancing current_page
            # past them — so a resume re-fetched and RE-COUNTED those rows
            # every run (and a persistently-empty mid-stream page stalled
            # progress while the counters grew). Pages past the gap are
            # re-fetched next run, when the gap has either filled (normal
            # growth race) or confirmed itself as end-of-data.
            advanced = 0
            for p, rows in zip(batch_pages, results):
                if not rows:
                    break
                _write_page(out_dir, p, rows)
                landed += len(rows)
                advanced += 1
            page += advanced
            keep_fetching = advanced == len(results) and advanced > 0
            save_progress(
                out_dir,
                {
                    "current_page": page,
                    "total_records": int(progress.get("total_records", 0)) + landed,
                    "status": "in_progress",
                },
            )
    progress = load_progress(out_dir)
    progress["status"] = "completed"
    save_progress(out_dir, progress)
    return landed


def read_landing(spark: SparkSession, out_dir: str, schema: StructType | str) -> DataFrame:
    """Batch read of the landing dir (A8's structure_raw_data replacement:
    declarative schema + confirm_status gate happen in the query)."""
    return spark.read.schema(schema).json(os.path.join(out_dir, "page_*.json"))


def distributed_fetch(
    spark: SparkSession,
    fetch_page: PageFetcher,
    n_pages: int,
    schema: StructType | str,
    parallelism: int | None = None,
) -> DataFrame:
    """The cluster-side fetch idiom (SURVEY.md A1 option 2):
    ``spark.range(n_pages)`` repartitioned across executors, each task pulls
    its pages through the injected fetcher inside mapInPandas. Use when the
    source API tolerates cluster-wide fan-out; otherwise land via
    :func:`land_pages` and read the landing dir.

    ``fetch_page`` must be picklable (module-level function or closure over
    picklable state)."""
    import pandas as pd

    parallelism = parallelism or max(2, n_pages // 4)
    struct = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    field_names = [f.name for f in struct.fields]  # resolved driver-side

    def run(batches):
        for pdf in batches:
            rows: list[dict] = []
            for p in pdf["id"]:
                rows.extend(robust_call(lambda: fetch_page(int(p))))
            if rows:
                yield pd.DataFrame(rows)
            else:
                yield pd.DataFrame({name: [] for name in field_names})

    return (
        spark.range(n_pages)
        .repartition(parallelism)
        .mapInPandas(run, schema=struct)
    )


def stream_landing(spark: SparkSession, out_dir: str, schema: StructType | str) -> DataFrame:
    """Streaming read of the landing dir — new page files become micro-batch
    input; pair with checkpointLocation on the sink for exactly-once."""
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "page_*.json")
        .json(out_dir)
    )


def parse_json_payload(payload: DataFrame, schema: StructType | str) -> DataFrame:
    """Shared downstream seam for string-payload sources: turn a one-column
    DataFrame of JSON strings (Kafka ``value``, socket lines, raw text
    files) into the same typed columns ``stream_landing`` produces. Every
    transformation downstream of this point is source-agnostic — the Kafka
    and file paths differ ONLY in the reader.

    Kafka tombstones (NULL value) parse to a NULL struct and malformed
    payloads parse (PERMISSIVE mode) to a struct of all-NULL fields —
    flattened, both become all-NULL rows that would flow silently into
    downstream aggregates. Such rows are DROPPED here, detected uniformly
    as ``to_json(parsed)`` being NULL or ``'{{}}'`` (no recognized field
    survived — which also covers a literal empty object). Callers needing
    a dead-letter stream should split on that predicate before this seam."""
    struct = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    col = payload.columns[0]
    parsed = payload.select(F.from_json(F.col(col).cast("string"), struct).alias("r"))
    return parsed.filter(
        F.to_json(F.col("r")).isNotNull() & (F.to_json(F.col("r")) != "{}")
    ).select("r.*")


def stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType | str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka twin of :func:`stream_landing` (SURVEY.md §1.1 "file/Kafka
    source"): same typed output schema, same downstream pipeline — offsets
    live in the sink checkpoint exactly like the file source's. Requires
    the spark-sql-kafka connector on the classpath (a production Spark
    distro ships it; this sandbox has no broker, so tests exercise the
    :func:`parse_json_payload` seam through a text-payload stream and only
    construct this reader)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_json_payload(raw.select("value"), schema)
