"""A6 dictionary file source: JSON load, validation, index/dim round-trip."""

from __future__ import annotations

import json

import pytest

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.dictionary import (
    LOCATIONS,
    build_variant_index,
    dim_table,
    load_locations_json,
)


def test_load_roundtrip(tmp_path):
    p = tmp_path / "locations.json"
    p.write_text(json.dumps(LOCATIONS, ensure_ascii=False), encoding="utf-8")
    loaded = load_locations_json(str(p))
    assert loaded == LOCATIONS
    assert build_variant_index(loaded) == build_variant_index()


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_locations_json(str(tmp_path / "nope.json"))


def test_load_malformed_raises(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"a": "not-a-list"}', encoding="utf-8")
    with pytest.raises(ValueError):
        load_locations_json(str(p))
    p.write_text("not json at all", encoding="utf-8")
    with pytest.raises(json.JSONDecodeError):
        load_locations_json(str(p))


def test_dim_table_matches_index(spark):
    dim = {(r["variant_norm"], r["canonical"]) for r in dim_table(spark).collect()}
    assert dim == set(build_variant_index().items())
