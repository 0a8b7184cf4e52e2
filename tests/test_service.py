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
