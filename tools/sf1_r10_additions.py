"""Dedicated sf1 (10×) measurement blocks for the round-10 additions —
the new headline entries (bm25_search, gopher_quality).

Deliberately NOT tools/sf1_bench.py (which re-runs the whole headline and
would clobber BENCH_DIAG.json with sf1-scale numbers — the documented r8
gotcha): this script times ONLY the listed queries with the bench's
noop-sink + clearCache discipline, min-of-3 interleaved, and PATCHES an
``r10_additions_sf1`` section into BENCH_sf1.json, leaving every other
field untouched.

Usage: SPARK_GRAFT_SF1_DIR=/tmp/sf1 python tools/sf1_r10_additions.py
(fixtures from tools/gen_sf1.py)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry  # noqa: E402
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.session import get_spark  # noqa: E402
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources import tables  # noqa: E402

QUERIES = ["bm25_search", "gopher_quality", "doc_perplexity", "doc_perplexity_bigram", "curriculum_schedule", "bm25_search_batch"]
REPS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(app_name="aldean-sf1-r10")
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
    spark.stop()

    path = os.path.join(repo, "BENCH_sf1.json")
    with open(path) as f:
        record = json.load(f)
    # MERGE into any existing section: the committed record carries
    # hand-derived fields (sf01 references, ratios, observations) that a
    # re-run must not silently delete
    section = record.setdefault("r10_additions_sf1", {})
    section.update(
        {
            "queries": timings,
            "methodology": f"dedicated min-of-{REPS} interleaved noop-sink "
            "(tools/sf1_r10_additions.py)",
        }
    )
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["r10_additions_sf1"], separators=(",", ":")))


if __name__ == "__main__":
    main()
