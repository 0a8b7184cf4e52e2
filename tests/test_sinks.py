"""A7 report sinks: the four reference analytics outputs round-trip through
CSV/parquet with schema and values intact."""

from __future__ import annotations

import glob

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.trips import (
    location_pairs,
    location_stats,
    multi_location_details,
    trips_master,
)
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.sinks import (
    write_parquet,
    write_report_csv,
)


def test_analytics_outputs_roundtrip(spark, sf_dir, tmp_path):
    outputs = {
        "master": trips_master(spark, sf_dir),
        "pairs": location_pairs(spark, sf_dir),
        "stats": location_stats(spark, sf_dir),
        "multi": multi_location_details(spark, sf_dir),
    }
    for name, df in outputs.items():
        csv_dir = str(tmp_path / f"{name}_csv")
        pq_dir = str(tmp_path / f"{name}_pq")
        write_report_csv(df, csv_dir)
        write_parquet(df, pq_dir)
        parts = glob.glob(csv_dir + "/part-*.csv")
        assert len(parts) == 1  # single report file
        # utf-8-sig parity with the reference's Power BI outputs: the single
        # report part leads with the UTF-8 BOM so Excel detects the encoding
        with open(parts[0], "rb") as f:
            assert f.read(3) == b"\xef\xbb\xbf"
        back = spark.read.parquet(pq_dir)
        assert back.count() == df.count()
        assert back.columns == df.columns


def test_report_csv_bom_optional_and_readable(spark, sf_dir, tmp_path):
    df = location_stats(spark, sf_dir)
    no_bom = str(tmp_path / "nobom_csv")
    write_report_csv(df, no_bom, bom=False)
    part = glob.glob(no_bom + "/part-*.csv")[0]
    with open(part, "rb") as f:
        assert f.read(3) != b"\xef\xbb\xbf"
    # the BOM'd file still round-trips through Spark's CSV reader
    with_bom = str(tmp_path / "bom_csv")
    write_report_csv(df, with_bom)
    back = spark.read.option("header", "true").csv(with_bom)
    assert back.count() == df.count()
    assert back.columns == df.columns


def test_partitioned_parquet(spark, sf_dir, tmp_path):
    df = trips_master(spark, sf_dir)
    out = str(tmp_path / "by_type")
    write_parquet(df, out, partition_by=["Trip_Type"])
    dirs = glob.glob(out + "/Trip_Type=*")
    assert len(dirs) >= 3  # partition pruning layout exists
    back = spark.read.parquet(out)
    assert back.count() == df.count()

    # a Trip_Type predicate must become a PartitionFilter (pruned scan),
    # not a post-scan filter — this is free 100x I/O reduction at scale
    filtered = back.filter(back.Trip_Type == "Round Trip")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(Trip_Type" in plan or "PartitionFilters: [" in plan
    assert "Trip_Type = Round Trip" in plan.replace("#", " ").replace(")", " ") or (
        "Round Trip" in plan
    )
    n_round = filtered.count()
    assert n_round == df.filter(df.Trip_Type == "Round Trip").count()


def test_orc_and_jsonl_round_trip(spark, sf_dir, tmp_path):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.sinks import (
        write_jsonl,
        write_orc,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "nation")
    orc_path = str(tmp_path / "orc")
    write_orc(src, orc_path)
    back = spark.read.orc(orc_path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    assert back.schema == src.schema

    jl_path = str(tmp_path / "jsonl")
    write_jsonl(src, jl_path)
    back2 = spark.read.schema(src.schema).json(jl_path)
    assert sorted(map(tuple, back2.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """The scale contract of partition_by: a filter on the partition column
    must reach the scan as a PartitionFilter (directory pruning — the scan
    never lists the other partitions' files), not a post-scan filter."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.sinks import write_parquet
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    # deterministic subset (limit() picks arbitrary rows per execution)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    path = str(tmp_path / "part_li")
    write_parquet(li, path, partition_by=["l_returnflag"])

    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == want > 0
