"""Dedicated sf1 (10×) measurement blocks for the round-9 additions —
the new headline entries (neardup_increment, curate_increment,
verify_manifest) plus re-measures of the two r8 heavy-tail queries on r9
code, plus the full-stack streaming config.

Deliberately NOT tools/sf1_bench.py (which re-runs the whole headline and
would clobber BENCH_DIAG.json with sf1-scale numbers — the documented r8
gotcha): this script times ONLY the listed queries with the bench's
noop-sink + clearCache discipline, min-of-3 interleaved, and PATCHES an
``r9_additions_sf1`` section into BENCH_sf1.json, leaving every other
field untouched.

Usage: SPARK_GRAFT_SF1_DIR=/tmp/sf1 python tools/sf1_r9_additions.py
(fixtures from tools/gen_sf1.py)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry  # noqa: E402
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.session import get_spark  # noqa: E402
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources import tables  # noqa: E402

QUERIES = [
    "neardup_increment",
    "curate_increment",
    "verify_manifest",
    "data_card",
    "training_export_sharded",
]
REPS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(app_name="aldean-sf1-r9")
    qs = registry.all_queries()

    for t in tables.TABLES:
        tables.load_table(spark, sf_dir, t).count()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    timings = {n: run_once(n) for n in QUERIES}
    for _ in range(REPS - 1):  # interleaved min — the bench discipline
        for n in QUERIES:
            timings[n] = min(timings[n], run_once(n))

    # full-stack streaming replay at sf1, best-of-2 (bench methodology)
    from pyspark.sql import functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
        CURATION_QUALITY_GATE,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming import (
        pipeline as stream_pipeline,
    )

    docs_tbl = tables.load_table(spark, sf_dir, "documents")
    eval_df = docs_tbl.filter(F.col("doc_id") % 997 == 0).select("text")
    walls: list[float] = []
    best: dict | None = None
    for _rep in range(2):
        root = tempfile.mkdtemp(prefix="sf1_stream_")
        try:
            src = os.path.join(root, "src")
            docs_tbl.select(
                "doc_id",
                "text",
                (
                    F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(
                        secs=F.pmod(F.col("doc_id"), F.lit(600)).cast("double")
                    )
                ).alias("ts"),
            ).repartition(8).write.parquet(src)
            rows_in = spark.read.parquet(src).count()
            stream_df = (
                spark.readStream.schema("doc_id long, text string, ts timestamp")
                .option("maxFilesPerTrigger", 2)
                .parquet(src)
            )
            t0 = time.perf_counter()
            q = stream_pipeline.run_stream_curation(
                stream_df,
                os.path.join(root, "sink"),
                os.path.join(root, "ckpt"),
                neardup_threshold=0.6,
                quality_gate=CURATION_QUALITY_GATE,
                boilerplate_min_doc_frac=0.1,
                boilerplate_min_docs=2,
                eval_df=eval_df,
            )
            q.awaitTermination()
            wall = round(time.perf_counter() - t0, 3)
            kept = spark.read.parquet(os.path.join(root, "sink")).count()
            walls.append(wall)
            if best is None or wall < best["wall_sec"]:
                best = {
                    "curation_rows_per_sec": round(rows_in / wall, 1),
                    "wall_sec": wall,
                    "rows_in": rows_in,
                    "rows_kept": kept,
                }
            spark.catalog.clearCache()
        finally:
            shutil.rmtree(root, ignore_errors=True)
    full_stack = dict(best)
    full_stack["walls_all_reps"] = walls
    spark.stop()

    path = os.path.join(repo, "BENCH_sf1.json")
    with open(path) as f:
        record = json.load(f)
    # MERGE into any existing section: the committed record carries
    # hand-derived fields (sf01 same-code references, ratio_10x,
    # observations) that a re-run must not silently delete
    section = record.setdefault("r9_additions_sf1", {})
    section.update(
        {
            "queries": timings,
            "streaming_full_stack": {
                **section.get("streaming_full_stack", {}),
                **full_stack,
            },
            "methodology": f"dedicated min-of-{REPS} interleaved noop-sink; "
            "streaming best-of-2 fresh replays (tools/sf1_r9_additions.py)",
        }
    )
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["r9_additions_sf1"], separators=(",", ":")))


if __name__ == "__main__":
    main()
