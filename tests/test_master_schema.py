"""B7: the master output must keep the reference's exact 25-column order
(Main.py:430-438)."""

from __future__ import annotations

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.trips import (
    MASTER_COLUMNS,
    trips_master,
    trips_master_fuzzy,
)


def test_master_column_order(spark, sf_dir):
    assert len(MASTER_COLUMNS) == 25
    assert trips_master(spark, sf_dir).columns == MASTER_COLUMNS
    assert trips_master_fuzzy(spark, sf_dir).columns == MASTER_COLUMNS
