"""Action-level profiler: run ONE registered query with every Spark action
(count/collect/parquet write/localCheckpoint/noop save) timed and attributed
to its repo call site. Answers "where do the N jobs of an increment query
spend their wall" (guide §1 — measure before touching the action inventory).

Usage: python tools/r14_actions.py <query> [--sf DIR] [--reps 1]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # Spark 4: runtime frames are the classic subclass, which overrides
    # count/collect — patching the abstract parent never fires
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # Spark 3.x
    from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.session import get_spark
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources import tables

EVENTS: list[dict] = []


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "r14_actions" in fn or "pyspark" in fn or "functools" in fn:
            continue
        if "advanced_logistics" in fn or fn.endswith("bench.py"):
            return f"{os.path.basename(fn)}:{fr.lineno} {fr.name}"
    return "caller"


def _wrap(cls, meth):
    orig = getattr(cls, meth)

    @functools.wraps(orig)
    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        EVENTS.append({
            "action": meth, "sec": round(time.perf_counter() - t0, 3),
            "site": _site(),
        })
        return out

    setattr(cls, meth, timed)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    for meth in ("count", "collect", "localCheckpoint", "checkpoint"):
        _wrap(DataFrame, meth)
    for meth in ("parquet", "save", "csv", "json"):
        _wrap(DataFrameWriter, meth)

    spark = get_spark(app_name="r14-actions")
    qs = registry.all_queries()
    for t in tables.TABLES:
        tables.load_table(spark, args.sf, t).count()
    EVENTS.clear()

    for rep in range(args.reps):
        spark.catalog.clearCache()
        EVENTS.append({"action": f"--- rep {rep} start ---", "sec": 0, "site": ""})
        t0 = time.perf_counter()
        qs[args.query](spark, args.sf).write.format("noop").mode("overwrite").save()
        total = round(time.perf_counter() - t0, 3)
        EVENTS.append({"action": f"--- rep {rep} TOTAL ---", "sec": total, "site": ""})

    for e in EVENTS:
        print(json.dumps(e))
    acc = sum(e["sec"] for e in EVENTS if not e["action"].startswith("---"))
    print(json.dumps({"accounted_action_sec": round(acc, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
