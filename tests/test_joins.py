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
