"""Join-strategy operator tests: salted join correctness under skew,
theta-join containment tier vs the generated-regex tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.functions.arabic import (
    normalize_arabic,
)
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.joins import (
    salted_join,
    tier2_theta_join,
)
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.lookup import (
    tier12_expr,
)
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.dictionary import (
    dim_table,
)


def test_salted_join_matches_plain_join(spark):
    # heavily skewed fact: 90% of rows share one key
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(50)], ["k", "label"])

    plain = fact.join(dim, "k").select("payload", "label")
    salted = salted_join(fact, dim, "k", n_salts=8).select("payload", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "d1")], ["k", "label"])
    out = salted_join(fact, dim, "k", n_salts=4, how="left").collect()
    got = {(r["k"], r["v"], r["label"]) for r in out}
    assert got == {(1, "a", "d1"), (99, "b", None)}


def test_theta_join_matches_regex_tier(spark):
    tokens = [
        "مطار القاهرة الجديد",
        "رحلة الي الهرم الكبير",
        "وسط البلد مساء",
        "لا يوجد",
        "the pyramids tour",
        "فندق هيلتون والتحرير",
    ]
    df = (
        spark.createDataFrame([(i, t) for i, t in enumerate(tokens)], ["__tid", "tok"])
        .withColumn("norm", normalize_arabic(F.col("tok")))
    )
    # expression path (generated longest-first alternation, tiers 1+2)
    expr_out = {
        r["__tid"]: r["c"]
        for r in df.select("__tid", tier12_expr(F.col("norm")).alias("c")).collect()
    }
    theta_out = {
        r["__tid"]: r["canonical"]
        for r in tier2_theta_join(df, dim_table(spark)).collect()
    }
    # tier1 exact hits are a subset of containment hits, so on this corpus
    # both paths must agree
    assert theta_out == expr_out
    assert expr_out[0] == "Cairo Airport"
    assert expr_out[3] is None


def test_asof_join_matches_naive_range_join(spark):
    """Property: the union-window as-of equals the naive formulation
    (range-join all earlier right rows, keep the max right_ts one) —
    including ties at equal timestamps and left rows with no match."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 1, 50), (4, 2, 100), (5, 3, 100)],
        ["lid", "k", "t"],
    )
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 205, "c"), (2, 150, "d")],
        ["k", "rt", "payload"],
    )
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt", payload_cols=["payload"]
        ).collect()
    }
    # lid 1: rt=100 == t → visible (ASOF >=); lid 2: tie at 205 → "c";
    # lid 3: no earlier right row → NULL; lid 4: 150 > 100 → NULL;
    # lid 5: key absent from right → NULL
    assert got == {1: "a", 2: "c", 3: None, 4: None, 5: None}

    naive = (
        left.join(right, (left.k == right.k) & (right.rt <= left.t), "left")
        .groupBy("lid")
        .agg(F.max(F.struct("rt", "payload")).alias("s"))
        .select("lid", F.col("s.payload").alias("payload"))
    )
    assert got == {r["lid"]: r["payload"] for r in naive.collect()}


def test_asof_join_null_payload_not_backfilled(spark):
    """A NULL payload field on the MATCHED right row must survive as NULL —
    a per-column fill would silently take that column from an older right
    row, mixing columns across rows (DuckDB ASOF returns the matched row
    wholesale). The packed-struct fill guarantees row atomicity."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 1, 300)], ["lid", "k", "t"])
    right = spark.createDataFrame(
        [(1, 100, "old_a", "old_b"), (1, 200, None, "new_b")],
        ["k", "rt", "pa", "pb"],
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt", payload_cols=["pa", "pb"]
    ).collect()
    assert len(out) == 1
    # matched row is rt=200: pa must be its NULL, not "old_a" from rt=100
    assert out[0]["pa"] is None
    assert out[0]["pb"] == "new_b"


def test_asof_join_is_single_shuffle(spark):
    """Plan shape: the as-of join must be union → one Exchange on the key →
    window, never a join node (no row amplification)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.joins import asof_join

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.col("id").alias("lid")
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("rt"), F.col("id").alias("p")
    )
    out = asof_join(left, right, "k", "t", "rt", ["p"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_range_join_matches_naive_theta(spark):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(k, float(t)) for k in (1, 2) for t in range(0, 100, 7)],
        "k int, pt double",
    ).select("k", F.timestamp_seconds("pt").alias("pt"))
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 9.5, 30.0), (2, 50.0, 51.0), (2, 0.0, 100.0), (3, 0.0, 100.0)],
        "k int, s double, e double",
    ).select(
        "k",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    # bin width much smaller AND larger than intervals: same answer either way
    naive = points.join(
        intervals,
        (points.k == intervals.k) & (points.pt >= intervals.s) & (points.pt < intervals.e),
    ).count()
    for bin_seconds in (3, 60, 7200):
        got = range_join(points, intervals, ["k"], "pt", "s", "e", bin_seconds).count()
        assert got == naive, f"bin_seconds={bin_seconds}: {got} != {naive}"


def test_range_join_is_equi_join_not_nested_loop(spark):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.joins import range_join

    points = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.timestamp_seconds(F.col("id")).alias("pt")
    )
    intervals = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 10).alias("s"),
        F.timestamp_seconds(F.col("id") * 10 + 30).alias("e"),
    )
    out = range_join(points, intervals, ["k"], "pt", "s", "e", 30)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
