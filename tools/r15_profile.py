"""Round-15 optimization profiler: isolate registered queries one at a time.

Same methodology as tools/r14_profile.py (guide §1: construct wall +
min-of-REPS noop-sink walls + `.explain('formatted')` capture), with two
round-15 additions per VERDICT r14 #1 (calibrated isolation):

  - a DRIFT SENTINEL wall (bench.py's fixed pure-JVM 1B-row xxhash64 /
    bit_xor workload, warm-up + min-of-3) measured once per session and
    printed with every line, so cross-session comparisons can normalize
    host speed;
  - plan captures land in plans/r15/.

Usage:
    python tools/r15_profile.py [--tag before|after] [--reps 3] [--sf DIR] q1 q2 ...

Prints one JSON line per query:
    {"query": ..., "construct_sec": ..., "walls": [...], "min": ...,
     "calibration_sec": ...}
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

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="r15-profile")
    qs = registry.all_queries()
    for t in tables.TABLES:
        tables.load_table(spark, args.sf, t).count()

    def _calibration_wall() -> float:
        t0 = time.perf_counter()
        spark.range(0, 1_000_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS h", "avg(id % 1000) AS a"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    _calibration_wall()  # warm-up eats the janino compile
    calibration = min(_calibration_wall() for _ in range(3))

    names = args.queries or list(qs)
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        spark.sparkContext.setJobDescription(f"r15-profile:{name}")
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
            "calibration_sec": calibration,
        }), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
