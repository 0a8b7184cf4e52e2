"""functions/fence.compute_once — the 1:1 Generate optimizer barrier.

Equivalence with the withColumn chain it replaces (new names), and the
r14 collision guard (ADVICE r13): a name that already exists in the
input would produce duplicate/ambiguous columns in the final select, so
the fence refuses loudly instead of failing (or silently duplicating)
at analysis time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.functions.fence import compute_once


def test_compute_once_matches_withcolumn_chain(spark):
    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    cols = {
        "sq": F.col("id") * F.col("id"),
        "tag": F.concat(F.lit("g"), F.col("grp").cast("string")),
        "maybe": F.when(F.col("id") % 2 == 0, F.col("id")),  # NULLs ride
    }
    fenced = compute_once(df, cols)
    plain = df
    for n, c in cols.items():
        plain = plain.withColumn(n, c)
    assert fenced.columns == plain.columns
    assert sorted(map(tuple, fenced.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # a filter on a fenced column cannot push below the Generate — the
    # barrier that makes the expression compute once
    assert "Generate" in fenced.filter(F.col("sq") > 100)._jdf.queryExecution().optimizedPlan().toString()


def test_compute_once_empty_and_collisions(spark):
    df = spark.range(0, 5).select(F.col("id"), F.lit(1).alias("x"))
    assert compute_once(df, {}) is df
    with pytest.raises(ValueError, match="collide"):
        compute_once(df, {"x": F.col("id") + 1})
    with pytest.raises(ValueError, match="__fence"):
        compute_once(
            df.withColumn("__fence", F.lit(0)), {"y": F.col("id") + 1}
        )
