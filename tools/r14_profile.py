"""Round-14 optimization profiler: isolate registered queries one at a time.

For each query name given on argv (or a built-in default set):
  1. time PLAN CONSTRUCTION (the Python call that builds the DataFrame),
  2. noop-sink it REPS times (min = the comparable number; guide §1.4),
  3. write `.explain('formatted')` to plans/r14/<name>_<tag>.txt.

Usage:
    python tools/r14_profile.py [--tag before|after] [--reps 3] [--sf DIR] q1 q2 ...

Prints one JSON line per query:
    {"query": ..., "construct_sec": ..., "walls": [...], "min": ...}

This is a MEASUREMENT tool (guide §1): job descriptions are set per query so
a Spark UI / event log session maps walls back to queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.session import get_spark
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources import tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="suffix for the plan file (before/after); omit to skip plan capture")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="r14-profile")
    qs = registry.all_queries()
    for t in tables.TABLES:
        tables.load_table(spark, args.sf, t).count()

    names = args.queries or list(qs)
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        spark.sparkContext.setJobDescription(f"r14-profile:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        construct = round(time.perf_counter() - t0, 3)
        if args.tag:
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        walls = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # re-build per rep: registered queries with side effects
            # (durable increment indexes) must run end-to-end like bench.py
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        print(json.dumps({
            "query": name, "construct_sec": construct,
            "walls": walls, "min": min(walls),
        }), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
