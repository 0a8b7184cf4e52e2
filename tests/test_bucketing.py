"""Bucketed co-located joins (SURVEY.md 'partitioning & shuffle' mandate):
pre-bucketing both sides of a recurring join key eliminates the shuffle
entirely — THE join strategy for repeated fact-fact joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/bktdb'")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bktdb.li_b")
        )
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bktdb.orders_b")
        )
        # disable broadcast so the planner exercises the bucketed SMJ path
        # (at real scale neither fact side fits a broadcast anyway)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table("bktdb.li_b")
            b = spark.table("bktdb.orders_b")
            joined = a.join(b, a.l_orderkey == b.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # co-located buckets: no hash-partition shuffle feeds the join
            assert "Exchange hashpartitioning" not in plan, (
                f"bucketed join still shuffles:\n{plan[:2000]}"
            )

            # correctness: same result as the plain join
            got = joined.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
            plain = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )
            assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")
