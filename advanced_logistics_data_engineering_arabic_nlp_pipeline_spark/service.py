"""Service surface (SURVEY.md §2 K; api.py:162-382 behavior).

The reference exposes the cleaner through FastAPI endpoints: /clean (single),
/clean/batch (sequential list-comp — its own docstring claims "vectorised",
api.py:12, but it loops), /run-cycle (broken import as shipped, api.py:334),
/stats and /health. This module is the engine-side equivalent: the HTTP
framing is out of engine scope, but every endpoint's computation is here,
with /clean/batch actually vectorized as ONE DataFrame pass and /run-cycle
actually working (landing source + enrichment instead of the broken import).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import __version__
from .operators.extract import (
    categorize_trip_type_expr,
    end_location_clean_expr,
    extract_all_locations_expr,
    with_all_locations_fuzzy,
)
from .sources import landing
from .sources.dictionary import build_variant_index, load_locations_json


def clean_texts_df(
    df: DataFrame,
    text_col: str = "text",
    fuzzy: bool = True,
    index: dict[str, str] | None = None,
    cutoff: float | None = None,
    caches_out: list | None = None,
) -> DataFrame:
    """F5 shared codepath (api.py:210-225 = Main.py:406-425): adds
    all_locations, main_location, trip_type for a text column.
    ``caches_out`` collects join-path cut-point caches for the caller to
    unpersist after its terminal action (large-mapping requests in a
    long-lived service must not leak cached blocks)."""
    index = index if index is not None else build_variant_index()
    t = F.col(text_col)
    if fuzzy:
        # id_col is documented as ignored (resolution keys on the text
        # itself) — pass the text column like with_nlp_enrichment does;
        # the old fabricated __rid monotonically_increasing_id column was
        # dead work in every request
        df = with_all_locations_fuzzy(
            df, text_col, text_col, "all_locations", index, cutoff=cutoff,
            caches_out=caches_out,
        )
    else:
        df = df.withColumn("all_locations", extract_all_locations_expr(t, index))
    return df.withColumn(
        "main_location", end_location_clean_expr(t, F.col("all_locations"))
    ).withColumn("trip_type", categorize_trip_type_expr(t, F.col("all_locations")))


def config_from_env(env: dict[str, str] | None = None) -> dict:
    """The reference's documented ops knobs, read the same way it reads
    them at startup (api.py:106-134): ``FUZZY_ENABLED`` (``"true"``/
    ``"false"``, case-insensitive), ``FUZZY_CUTOFF`` (int score 0-100),
    ``LOCATIONS_PATH`` (path to a ``{canonical: [variants]}`` JSON; unset →
    the built-in dictionary)."""
    env = env if env is not None else dict(os.environ)
    locations_path = env.get("LOCATIONS_PATH")
    return {
        "fuzzy_enabled": env.get("FUZZY_ENABLED", "true").lower() == "true",
        "fuzzy_cutoff": int(env.get("FUZZY_CUTOFF", "82")),
        "locations": (
            load_locations_json(locations_path) if locations_path else None
        ),
    }


class CleaningService:
    """Driver-side service state (the reference's singleton cleaner +
    module-global stats, api.py:106-134, 354-359)."""

    def __init__(
        self,
        spark: SparkSession,
        locations: dict[str, list[str]] | None = None,
        fuzzy_enabled: bool = True,
        fuzzy_cutoff: float = 82,
    ) -> None:
        self.spark = spark
        self.fuzzy_enabled = fuzzy_enabled
        self.fuzzy_cutoff = fuzzy_cutoff
        self.index = build_variant_index(locations) if locations else build_variant_index()
        self._last_stats: dict = {"status": "idle", "records": 0}

    @classmethod
    def from_env(
        cls, spark: SparkSession, env: dict[str, str] | None = None
    ) -> "CleaningService":
        """Construct from the reference's env-var config surface
        (:func:`config_from_env`)."""
        cfg = config_from_env(env)
        return cls(
            spark,
            locations=cfg["locations"],
            fuzzy_enabled=cfg["fuzzy_enabled"],
            fuzzy_cutoff=cfg["fuzzy_cutoff"],
        )

    def health(self) -> dict:
        return {"status": "ok", "version": __version__, "fuzzy": self.fuzzy_enabled}

    def clean_one(self, text: str | None, fuzzy: bool | None = None) -> dict:
        t0 = time.perf_counter()
        row = self.clean_batch([text], fuzzy=fuzzy)["results"][0]
        row["processing_ms"] = round((time.perf_counter() - t0) * 1000, 3)
        return row

    def clean_batch(
        self, texts: list[str | None], fuzzy: bool | None = None
    ) -> dict:
        """One DataFrame pass for the whole batch — the vectorization the
        reference's /clean/batch claims but doesn't do (api.py:301-304).
        Per-item ``processing_ms`` mirrors the reference's response shape
        (api.py:301-311); because the batch is one vectorized pass, the
        per-item figure is the amortized share of the pass, not a per-row
        wall clock (which doesn't exist in a set-oriented engine)."""
        t0 = time.perf_counter()
        use_fuzzy = self.fuzzy_enabled if fuzzy is None else fuzzy
        df = self.spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "idx int, text string"
        )
        caches: list = []
        out = clean_texts_df(
            df, "text", use_fuzzy, self.index, cutoff=self.fuzzy_cutoff,
            caches_out=caches,
        ).orderBy("idx")
        collected = out.collect()
        # collect() is the terminal action: any join-path cut-point caches
        # are dead weight now — a long-lived service must not accumulate
        # cached blocks per large-mapping request (ADVICE r4)
        for c in caches:
            c.unpersist(blocking=True)
        total_ms = round((time.perf_counter() - t0) * 1000, 3)
        per_item_ms = round(total_ms / max(len(collected), 1), 3)
        results = [
            {
                "original": r["text"],
                "main_location": r["main_location"],
                "all_locations": list(r["all_locations"]),
                "trip_type": r["trip_type"],
                "processing_ms": per_item_ms,
            }
            for r in collected
        ]
        return {"results": results, "total_ms": total_ms}

    def run_cycle(self, fetch_page: landing.PageFetcher, landing_dir: str) -> dict:
        """One fetch→land→enrich cycle (K4, fixed): land new pages, read the
        landing dir, run the cleaning pipeline, record stats."""
        t0 = time.perf_counter()
        landed = landing.land_pages(fetch_page, landing_dir)
        df = landing.read_landing(
            self.spark, landing_dir, "serialId bigint, confirm_status boolean, end_location string"
        ).filter(F.col("confirm_status").eqNullSafe(True))
        caches: list = []
        enriched = clean_texts_df(
            df, "end_location", self.fuzzy_enabled, self.index,
            cutoff=self.fuzzy_cutoff, caches_out=caches,
        )
        records = enriched.count()
        for c in caches:
            c.unpersist(blocking=True)
        from datetime import datetime, timezone

        self._last_stats = {
            "status": "completed",
            "records": records,
            "landed": landed,
            "duration_ms": round((time.perf_counter() - t0) * 1000, 3),
            "finished_at": datetime.now(timezone.utc).isoformat(),
        }
        return dict(self._last_stats)

    def stats(self) -> dict:
        return dict(self._last_stats)
