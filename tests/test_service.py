"""Service-surface tests (SURVEY.md §2 K): single/batch clean, run-cycle
over the landing source, stats."""

from __future__ import annotations

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.service import CleaningService


def test_clean_one_readme_golden(spark):
    svc = CleaningService(spark)
    out = svc.clean_one("تشغيل 12 ساعه مطارررر القاهره وعوده")
    assert out["main_location"] == "Cairo Airport"  # via fuzzy tier
    assert out["trip_type"] == "Airport Transfer"
    assert out["all_locations"] == ["Cairo Airport"]
    assert out["processing_ms"] > 0


def test_clean_batch_one_pass(spark):
    svc = CleaningService(spark)
    out = svc.clean_batch(
        ["الهرم + المطار و وسط البلد", "", None, "فاتورة ادارة", "12345"]
    )
    r = out["results"]
    # per-item timing parity with the reference's batch response shape
    # (amortized share of the single vectorized pass)
    assert all(item["processing_ms"] > 0 for item in r)
    assert abs(sum(item["processing_ms"] for item in r) - out["total_ms"]) < len(r)
    assert r[0]["all_locations"] == ["Pyramids of Giza", "Cairo Airport", "Downtown Cairo"]
    assert r[0]["trip_type"] == "Airport Transfer"
    assert r[1]["main_location"] == "Undefined"
    assert r[2]["main_location"] == "Undefined"
    assert r[3]["trip_type"] == "Admin/Management"
    assert r[4]["main_location"] == "Unknown"


def test_clean_without_fuzzy_falls_back(spark):
    svc = CleaningService(spark, fuzzy_enabled=False)
    out = svc.clean_one("تشغيل 12 ساعه مطارررر القاهره وعوده")
    # without tier-3 the squeezed misspelling can't resolve → title fallback
    assert out["main_location"] == "تشغيل 12"
    assert out["trip_type"] == "Airport Transfer"  # cascade still fires on regex


def test_run_cycle_and_stats(spark, tmp_path):
    svc = CleaningService(spark)
    pages = [
        [
            {"serialId": 1, "confirm_status": True, "end_location": "مطار القاهرة"},
            {"serialId": 2, "confirm_status": False, "end_location": "الهرم"},
        ],
        [{"serialId": 3, "confirm_status": True, "end_location": "هيلتون"}],
    ]

    def fetch(page: int):
        return pages[page] if page < len(pages) else []

    out = svc.run_cycle(fetch, str(tmp_path / "cycle"))
    assert out["records"] == 2  # confirm_status gate dropped serialId 2
    assert out["landed"] == 3
    assert svc.stats()["status"] == "completed"


def test_config_from_env_and_from_env_service(spark, tmp_path):
    """The reference's documented ops knobs (api.py:106-134): FUZZY_ENABLED,
    FUZZY_CUTOFF, LOCATIONS_PATH drive service construction."""
    import json

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.service import config_from_env

    loc_path = tmp_path / "locations.json"
    loc_path.write_text(
        json.dumps({"TestPlace": ["مكان الاختبار"]}), encoding="utf-8"
    )
    env = {
        "FUZZY_ENABLED": "False",
        "FUZZY_CUTOFF": "90",
        "LOCATIONS_PATH": str(loc_path),
    }
    cfg = config_from_env(env)
    assert cfg["fuzzy_enabled"] is False
    assert cfg["fuzzy_cutoff"] == 90
    assert cfg["locations"] == {"TestPlace": ["مكان الاختبار"]}

    svc = CleaningService.from_env(spark, env)
    assert svc.fuzzy_enabled is False and svc.fuzzy_cutoff == 90
    out = svc.clean_one("مكان الاختبار")
    assert out["main_location"] == "TestPlace"

    # defaults: unset env → built-in dictionary, fuzzy on at cutoff 82
    svc2 = CleaningService.from_env(spark, {})
    assert svc2.fuzzy_enabled is True and svc2.fuzzy_cutoff == 82


def test_api_endpoint_functions_reference_shapes(spark, tmp_path):
    """The framework-free endpoint functions must return the reference's
    pydantic response field sets exactly (api.py:162-198)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import api

    svc = CleaningService(spark)

    h = api.health_endpoint(svc)
    assert set(h) == {"status", "cleaner", "version", "time"}
    assert h["status"] == "ok" and h["cleaner"] == "ready"
    assert set(api.health_endpoint(None)) == {"status", "cleaner", "version", "time"}
    assert api.health_endpoint(None)["status"] == "degraded"

    one = api.clean_endpoint(svc, "رحلة الاهرام والمتحف المصرى")
    assert set(one) == {
        "original", "main_location", "all_locations", "trip_type", "processing_ms",
    }

    batch = api.clean_batch_endpoint(svc, ["الاهرام", "المطار"], fuzzy=False)
    assert set(batch) == {"results", "total", "processing_ms"}
    assert batch["total"] == 2

    def fetch(page: int):
        return (
            [{"serialId": 1, "confirm_status": True, "end_location": "الاهرام"}]
            if page == 0
            else []
        )

    cyc = api.run_cycle_endpoint(svc, fetch, str(tmp_path / "cycle"))
    assert set(cyc) == {
        "status", "records", "started_at", "finished_at", "duration_s",
    }
    assert cyc["status"] == "completed" and cyc["records"] == 1

    st = api.stats_endpoint(svc)
    assert set(st) == {"last_run_at", "records_saved", "status"}
    assert st["records_saved"] == 1 and st["last_run_at"] is not None

    # fastapi absent in this container: create_app must raise cleanly
    if not api.HAS_FASTAPI:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="fastapi"):
            api.create_app(svc)


def test_clean_batch_join_path_leaves_no_cached_blocks(spark, monkeypatch):
    """ADVICE r4: on the broadcast-join path the cascade's cut-point caches
    used to outlive the request in a long-lived service. clean_batch's
    terminal collect must now unpersist them — zero persisted RDDs after
    the call (force the join path via MAPPING_LITERAL_MAX=0)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import lookup
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.service import CleaningService

    # other suite tests may hold session-lifetime blocks (e.g. RDD
    # localCheckpoints, which clearCache doesn't touch) — assert OUR
    # requests add nothing, via a storage snapshot diff
    def storage_ids():
        return {x.id() for x in spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    before = storage_ids()
    monkeypatch.setattr(lookup, "MAPPING_LITERAL_MAX", 0)
    svc = CleaningService(spark)
    out = svc.clean_batch(["من الهرم الى المطار", "مطارر", None])
    assert len(out["results"]) == 3
    assert storage_ids() <= before

    # literal path too (resolve_tokens_fuzzy unpersists internally — that
    # unpersist was also a no-op pre-r5 because the cache handle pointed at
    # a derived join plan, not the cached frame)
    monkeypatch.setattr(lookup, "MAPPING_LITERAL_MAX", 512)
    out = svc.clean_batch(["من الهرم الى المطار"])
    assert len(out["results"]) == 1
    assert storage_ids() <= before


def test_api_fuzzy_default_defers_to_service_config(spark):
    """Round-5 review regression: a /clean request that doesn't send a
    'fuzzy' field must NOT override the service's FUZZY_ENABLED config —
    the endpoint passes fuzzy=None through, and the service resolves it
    from its own configuration."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import api

    class Probe:
        def __init__(self):
            self.seen = []

        def clean_one(self, text, fuzzy=None):
            self.seen.append(fuzzy)
            return {"ok": True}

        def clean_batch(self, texts, fuzzy=None):
            self.seen.append(fuzzy)
            return {"results": [{}] * len(texts), "total_ms": 0.0}

    svc = Probe()
    api.clean_endpoint(svc, "x")
    api.clean_batch_endpoint(svc, ["x"])
    assert svc.seen == [None, None]
    api.clean_endpoint(svc, "x", fuzzy=False)
    assert svc.seen[-1] is False
