"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.session import get_spark
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources import tables

# Headline queries: one per major capability area; extended as plans land.
HEADLINE = [
    # relational spine
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "order_priority_share",
    "lineitem_unpivot",
    # NLP trips pipeline (expression tiers + fuzzy UDF variant)
    "trips_master",
    "trips_master_fuzzy",
    "location_pairs",
    "location_stats",
    "revenue_rollup",
    "revenue_cube",
    # as-of (point-in-time) join + range (interval) join
    "events_asof_rates",
    "events_attribution_range",
    # LLM-data ops
    "dedup_jaccard",
    "dedup_clusters",
    "curated_corpus",
    "dedup_winnow",
    # exact substring-level span dedup (r11, Lee et al. 2022)
    "dedup_substring",
    "dedup_substring_increment",
    "dedup_minhash",
    "dedup_simhash",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_ivf_kmeans",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "dedup_embedding_lsh",
    # SemDeDup cluster-then-prune semantic dedup (r8)
    "semdedup",
    "embedding_label_centroids",
    "text_quality",
    "multimodal_features",
    "multimodal_pixel_decode",
    "multimodal_audio_decode",
    "multimodal_video_decode",
    "pii_redaction",
    "docs_repetition",
    "decontaminate",
    # segment-level boilerplate removal (r8)
    "boilerplate_scrub",
    # packed-sequence materialization (r6) + the shipped training artifact
    # (r7 — VERDICT r6 bench-coverage gap: the chunked export is what a
    # training job actually reads, so it gets a headline entry)
    "sequence_chunks",
    "training_export_chunks",
    # mixture composition (r8): deterministic sampling / sharding / budgets
    "mixture_sample",
    "epoch_shards",
    "token_budget_mix",
    "dataset_split",
    "temperature_mix",
    "shard_manifest",
    "verify_manifest",
    "curriculum_schedule",
    "quality_sample",
    "corpus_diff",
    # lexical retrieval + published-recipe quality filters (r10)
    "bm25_search",
    "bm25_search_batch",
    "gopher_quality",
    "doc_perplexity",
    "doc_perplexity_bigram",
    # model-based lang-ID + DSIR importance resampling (r11)
    "lang_id_ngram",
    "dsir_sample",
    # hybrid lexical+dense RRF retrieval + linear quality head + BPE (r11)
    # (classifier_probe_eval moved to the train_eval_side block in r12 —
    # VERDICT r11 #7: 25 GD iterations are TRAINING cost, not a serve
    # shape; classifier_score keeps the serve path in the headline)
    "hybrid_search",
    "classifier_score",
    "bpe_train",
    "bpe_encode_stats",
    "retrieval_quality",
    "embedding_pca",
    # r12: BPE-unit packing/export, OPQ-rotated PQ
    "sequence_chunks_bpe",
    "training_export_chunks_bpe",
    "similarity_topk_opq",
    "token_budget_mix_bpe",
    # r13: consult-only semantic near-dup gate vs a frozen PQ index
    "semantic_gate",
    # the heavy tail (r9 — VERDICT r8 Next-round #1): the most expensive
    # registered paths get standing round-over-round numbers instead of
    # one-time dedicated blocks
    "data_card",
    "training_export_sharded",
    "neardup_increment",
    "curate_increment",
    # event-time windows
    "events_hourly",
    "events_sliding",
    "events_sessions",
]

# The ROUND-1 query set: the cross-round-comparable subtotal (the headline
# list grows as operators land, so the grand total is not comparable across
# rounds — compare subtotal_r1_queries to BENCH_r01.json). Module-level so
# tools/sf1_bench.py can recompute the subtotal after min-merging runs.
R1_SET = {
    "pricing_summary", "revenue_by_nation", "top_customers",
    "order_priority_share", "lineitem_unpivot", "trips_master",
    "trips_master_fuzzy", "location_pairs", "location_stats",
    "revenue_rollup", "dedup_jaccard", "dedup_minhash", "dedup_simhash",
    "similarity_topk", "similarity_topk_ivf", "text_quality",
    "multimodal_features", "events_hourly", "events_sliding",
    "events_sessions",
}

# Synthetic worst-case diagnostics: timed and reported per-run, but kept out
# of the headline total (they are adversarial stressors — e.g. every text
# unique so the distinct-resolve NLP optimization buys nothing — not
# representative workload).
STRESS = [
    "trips_fuzzy_stress",
]



def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="aldean-bench")
    queries = registry.all_queries()

    # Warm the JVM, file listing and parquet footers for every fixture table
    # once, so per-query numbers measure the query, not first-touch I/O.
    for t in tables.TABLES:
        tables.load_table(spark, sf_dir, t).count()

    # Drift sentinel (r14, VERDICT r13 #6): a FIXED pure-JVM workload with
    # no code under test — 1B-row range → xxhash64 bit_xor + modular avg,
    # whole-stage codegen, no Python, no disk, fixture-independent. Its
    # wall (~1.3 s on the reference host) calibrates the SESSION's host
    # speed so round-over-round comparisons can normalize out ambient
    # drift instead of re-litigating it (r11-r13 each burned analysis time
    # on uniform 1.2-1.4x session drift). One warm-up rep eats the janino
    # compile, then min-of-3 — the same discipline as the per-query mins,
    # so a merged record's calibration pairs with its merged leaves.
    # Recorded as `calibration_sec` next to `vintage` in the headline
    # record and the sidecar; compare query walls ACROSS rounds via
    # wall/calibration when the calibrations differ by >10%.
    def _calibration_wall() -> float:
        t0 = time.perf_counter()
        spark.range(0, 1_000_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS h", "avg(id % 1000) AS a"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    _calibration_wall()
    calibration_sec = min(_calibration_wall() for _ in range(3))

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        # noop sink: forces FULL computation of every output column.
        # A bare count() lets Spark prune projections (an NLP pipeline would
        # "finish" without running the NLP), understating the real work.
        df.write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 3)
        # Several operators cache() intermediate cut points (distinct-token
        # cascades, shingle frames). Within a query that is load-bearing;
        # across 30 back-to-back queries the orphaned entries accumulate in
        # the block manager and degrade later queries. Each query stands
        # alone, so drop leftovers outside the timed window.
        spark.catalog.clearCache()
        return elapsed

    # Two INTERLEAVED passes over the whole list, headline = per-query min.
    # The host absorbs random multi-second stall windows that hit whatever
    # queries are running (BASELINE.md "Noise"); a single-shot number
    # conflates those stalls (and first-run janino/JIT compile) with the
    # plan's actual cost, and back-to-back reps of one query can BOTH land
    # inside the same stall window — full passes put the two reps of each
    # query minutes apart, so a window poisons different queries in each
    # pass and the min stays clean. Caches are cleared between runs, so
    # pass 2 measures a warm JVM, not reused results; pass-1 timings are
    # reported under cold_queries so the one-time compile cost stays
    # visible.
    REPS = 3  # r7: ≥2 merged runs required; a third pass tightens the min
    # against session-wide drift (the committed r6 record was a uniformly
    # slow session — VERDICT r6 What's-wrong #4)
    present = [n for n in HEADLINE if n in queries]
    cold_timings = {n: run_once(n) for n in present}
    timings = dict(cold_timings)
    for _ in range(REPS - 1):
        for n in present:
            timings[n] = min(timings[n], run_once(n))
    # Stress reps are interleaved the same way as the headline set (full
    # pass over STRESS per rep, min across passes) — back-to-back reps of
    # one query can both land inside the same host stall window.
    stress_present = [n for n in STRESS if n in queries]
    stress = {n: run_once(n) for n in stress_present}
    for _ in range(REPS - 1):
        for n in stress_present:
            stress[n] = min(stress[n], run_once(n))

    # ANN index build vs serve split (VERDICT r4 "Next round" #1): the
    # registered ANN queries are self-contained (train+encode+serve in one
    # call), which books O(N) index-build cost as serve time — at 100 TB
    # nobody re-encodes the corpus per query. This section measures the
    # production accounting: build once (materialized), then serve against
    # the built index. Serve is min-of-REPS like the headline; build is a
    # single timing (it is one bounded job sequence, not noise-sensitive
    # sub-second work).
    from pyspark.sql import functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import (
        embeddings as emb_ops,
        similarity,
    )

    emb = tables.load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 3)

    def split(build_fn, serve_fn, remove_fn=None):
        idx, t_build = timed(build_fn)
        t_serve = None
        for _ in range(REPS):
            _, t = timed(
                lambda: serve_fn(idx)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            t_serve = t if t_serve is None else min(t_serve, t)
        out = {"build": t_build, "serve": t_serve}
        if remove_fn is not None:
            # delete half of the lifecycle (r6): tombstone 10% of ids
            # (below the compaction threshold — the steady-state shape),
            # then serve the tombstoned index. Proves removal cost is one
            # small-broadcast anti-join, not a rewrite, and serve stays
            # flat against the live view.
            removed, t_remove = timed(lambda: remove_fn(idx))
            t_serve_rm = None
            for _ in range(REPS):
                _, t = timed(
                    lambda: serve_fn(removed)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                t_serve_rm = t if t_serve_rm is None else min(t_serve_rm, t)
            out["remove_10pct"] = t_remove
            out["serve_tombstoned"] = t_serve_rm
            # removed.unpersist() releases the tombstone set AND the
            # original persisted table (it is the tombstones' base)
            removed.unpersist()
        elif hasattr(idx, "unpersist"):
            # non-frame indexes (e.g. the BM25 (stats, consts) tuple)
            # hold no pins; clearCache below covers any strays
            idx.unpersist()
        spark.catalog.clearCache()
        return out

    drop10 = emb.filter(F.col("vec_id") % 10 == 7).select("vec_id")

    ann_split = {
        "similarity_topk_pq": split(
            lambda: similarity.build_pq_index(emb),
            lambda idx: similarity.topk_pq(probes, index=idx),
            remove_fn=lambda idx: similarity.pq_index_remove(
                idx, drop10, persist=False
            ),
        ),
        "similarity_topk_ivfpq": split(
            lambda: similarity.build_ivfpq_index(emb),
            lambda idx: similarity.topk_ivfpq(probes, index=idx),
            remove_fn=lambda idx: similarity.ivfpq_index_remove(
                idx, drop10, persist=False
            ),
        ),
        "similarity_topk_ivf_kmeans": split(
            lambda: similarity.build_ivf_index(
                emb,
                centroids=similarity.train_kmeans_centroids(
                    emb, k=16, n_iters=4
                ).select("centroid_id", F.col("cv").alias("embedding")),
            ),
            lambda idx: similarity.topk_ivf(probes, index=idx),
            remove_fn=lambda idx: similarity.ivf_index_remove(
                idx, drop10, persist=False
            ),
        ),
        # r12 OPQ lifecycle: build = PCA + allocation + rotate + PQ
        # encode; serve = rotate probes (fold expression) + ADC. No
        # remove leg — removal delegates verbatim to the PQ index's
        # (already measured above).
        "similarity_topk_opq": split(
            lambda: emb_ops.build_opq_index(emb, dim=64),
            lambda idx: emb_ops.topk_opq(probes, idx),
        ),
    }

    # BM25 lifecycle (r10): same build-once/serve-many split as the ANN
    # indexes — build materializes the durable term-stats + constants
    # parquet artifact, serve scores against it (the corpus is still
    # scanned for tf, which is intrinsic to BM25 serve without a postings
    # index; what the build removes is the full-vocab df derivation and
    # the constants scan).
    import shutil as _shutil
    import tempfile as _tempfile

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import (
        retrieval,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
        BM25_K,
        BM25_QUERY,
    )

    docs_bm25 = tables.load_table(spark, sf_dir, "documents")
    _bm25_dir = _tempfile.mkdtemp(prefix="bench_bm25_idx_")
    try:
        # same timing discipline as the ANN entries — one split() helper
        # (r10 self-review: a hand-rolled copy would silently diverge)
        ann_split["bm25_search"] = split(
            lambda: retrieval.build_bm25_index(docs_bm25, _bm25_dir),
            lambda idx: retrieval.bm25_topk(
                docs_bm25,
                BM25_QUERY,
                k=BM25_K,
                term_stats=idx[0],
                consts=idx[1],
            ),
        )
    finally:
        _shutil.rmtree(_bm25_dir, ignore_errors=True)

    # Train-in-query side block (r12, VERDICT r11 #7): queries whose wall
    # is dominated by in-query TRAINING or evaluation harness cost —
    # 25-40 GD iterations (classifier_probe_eval), five ANN index builds
    # plus metric grading (ann_recall_eval) — are measured here, outside
    # the headline total, so the headline reflects serve shapes (the
    # cheap serve twins classifier_score / similarity_topk_* stay in it).
    # Single timings: these are bounded job sequences, not noise-critical
    # sub-second work (the ann_split build-timing precedent).
    train_eval_side = {}
    for _tq in ("classifier_probe_eval", "ann_recall_eval"):
        if _tq in queries:
            t0 = time.perf_counter()
            queries[_tq](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            train_eval_side[_tq] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()

    # Streaming curation throughput (VERDICT r7 Missing #2): an
    # availableNow replay of run_stream_curation with the near-dup gate ON
    # over the documents fixture, split into 4 micro-batches via
    # maxFilesPerTrigger. Reports end-to-end rows/s and per-batch wall
    # time so streaming regressions are visible round-over-round — the
    # batch queries above never execute the foreachBatch path, the
    # stateful dedup, or the durable near-dup index write.
    import shutil
    import tempfile

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming import (
        pipeline as stream_pipeline,
    )

    # Two full replays per CONFIG (fresh sink/ckpt/index each), headline =
    # the better wall — the first replay pays one-time codegen of the
    # streaming plan shapes (the stateful dedup subtree + the gate's
    # history joins exist in no batch query, so the batch passes above
    # don't warm them; the same-code spread measured 61→101 rows/s on a
    # single day from that compile cost alone). Both walls are reported so
    # the compile cost stays visible, mirroring cold_queries vs the
    # headline min.
    #
    # Two configs (VERDICT r8 Missing #2): the near-dup-gate path the
    # bench has carried since r8, and the FULL curation stack — quality
    # gate + boilerplate scrub + near-dup + decontamination + PII — so the
    # boilerplate stage's per-batch action cost is measured, not asserted,
    # and a regression anywhere in the composed path is visible
    # round-over-round.
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
        CURATION_QUALITY_GATE,
    )

    docs_tbl = tables.load_table(spark, sf_dir, "documents")
    # a small deterministic eval slice for the decontam stage. Deliberately
    # TINY (6 docs at sf0.1): the synthetic corpus draws from a small
    # vocabulary, so 3-token shingles collide heavily across documents —
    # the registered decontaminate query's % 97 slice (52 docs at sf0.1)
    # transitively "contaminates" 94% of the corpus and would starve every
    # stage after the decontam anti-join, making the full-stack number
    # measure an empty pipeline. % 997 still removes a substantial slice
    # (~43% at sf0.1 — decontam demonstrably does work) while leaving the
    # near-dup/repetition/PII stages real volume.
    eval_df = docs_tbl.filter(F.col("doc_id") % 997 == 0).select("text")

    def _run_stream_config(
        extra_kwargs: dict, with_embeddings: bool = False, reps: int = 2
    ) -> tuple[dict, list[float], dict]:
        walls: list[float] = []
        best: dict | None = None
        best_ms: dict[str, int] = {}
        for _rep in range(reps):
            stream_root = tempfile.mkdtemp(prefix="bench_stream_")
            try:
                src = os.path.join(stream_root, "src")
                docs_stream = docs_tbl.select(
                    "doc_id",
                    "text",
                    # ts span capped at 10 min << the 2 h watermark: the
                    # files are shuffled across batches, so an unbounded
                    # doc_id-seconds span would mark early docs late at
                    # bigger SFs and silently shrink rows_kept (sf1 =
                    # 13.9 h of synthetic time).
                    (
                        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                        + F.make_interval(
                            secs=F.pmod(F.col("doc_id"), F.lit(600)).cast("double")
                        )
                    ).alias("ts"),
                )
                if with_embeddings:
                    # semantic-gate config: 10% of arriving docs carry an
                    # embedding (left join + % 10 mask) — the realistic
                    # mixed-modality arrival shape, and the honest one to
                    # time: the gate's cost is judged-rows × index size
                    # (each judged row ADC-scans the compressed corpus),
                    # so attaching embeddings to EVERY arrival turns the
                    # block into a deliberate quadratic (measured 264 s
                    # at sf1 = 12.5k-doc batches × 13.3k index) instead
                    # of a gate-overhead measurement. Docs without an
                    # embedding pass unjudged (the NULL contract).
                    docs_stream = docs_stream.join(
                        emb.select(
                            F.col("vec_id").alias("doc_id"), "embedding"
                        ),
                        "doc_id",
                        "left",
                    ).withColumn(
                        "embedding",
                        F.when(
                            F.col("doc_id") % 10 == 0, F.col("embedding")
                        ),
                    )
                docs_stream.repartition(8).write.parquet(src)
                rows_in = spark.read.parquet(src).count()
                schema = "doc_id long, text string, ts timestamp"
                if with_embeddings:
                    schema += ", embedding array<float>"
                stream_df = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 2)
                    .parquet(src)
                )
                t0 = time.perf_counter()
                q = stream_pipeline.run_stream_curation(
                    stream_df,
                    os.path.join(stream_root, "sink"),
                    os.path.join(stream_root, "ckpt"),
                    neardup_threshold=0.6,
                    **extra_kwargs,
                )
                q.awaitTermination()
                stream_wall = round(time.perf_counter() - t0, 3)
                rows_kept = spark.read.parquet(
                    os.path.join(stream_root, "sink")
                ).count()
                batch_ms = {
                    str(p["batchId"]): p["durationMs"].get("triggerExecution")
                    for p in q.recentProgress
                    if p.get("numInputRows", 0)
                    or p["durationMs"].get("triggerExecution")
                }
                walls.append(stream_wall)
                if best is None or stream_wall < best["wall_sec"]:
                    best = {
                        "curation_rows_per_sec": round(rows_in / stream_wall, 1),
                        "wall_sec": stream_wall,
                        "rows_in": rows_in,
                        "rows_kept": rows_kept,
                        "n_batches": len(batch_ms),
                    }
                    best_ms = batch_ms
                spark.catalog.clearCache()
            finally:
                shutil.rmtree(stream_root, ignore_errors=True)
        out = dict(best)
        out["walls_all_reps"] = walls
        return out, walls, best_ms

    streaming_bench, _, batch_ms = _run_stream_config({})
    full_stack_bench, _, full_stack_batch_ms = _run_stream_config(
        {
            "quality_gate": CURATION_QUALITY_GATE,
            "boilerplate_min_doc_frac": 0.1,
            "boilerplate_min_docs": 2,
            "eval_df": eval_df,
        }
    )
    streaming_bench["full_stack"] = full_stack_bench

    # Semantic near-dup gate config (r13, VERDICT r12 Next-round #7): the
    # stream consults a FROZEN durable PQ index artifact built from the
    # "history" two-thirds of the embeddings — build cost booked separately
    # (it is the nightly build job, not stream serve); the stream walls
    # measure the consult-only ADC gate per micro-batch on top of the base
    # exact-dedup pipeline.
    sem_dir = tempfile.mkdtemp(prefix="bench_sem_idx_")
    try:
        t0 = time.perf_counter()
        _sem_idx = similarity.build_pq_index(
            emb.filter(F.col("vec_id") % 3 != 0)
        )
        similarity.save_pq_index(_sem_idx, sem_dir)
        _sem_build = round(time.perf_counter() - t0, 3)
        _sem_idx.unpersist()
        spark.catalog.clearCache()
        semantic_bench, _, _ = _run_stream_config(
            {"semantic_threshold": 0.9, "semantic_index": sem_dir},
            with_embeddings=True,
        )
        semantic_bench["index_build_sec"] = _sem_build
        streaming_bench["semantic_gate"] = semantic_bench
    finally:
        shutil.rmtree(sem_dir, ignore_errors=True)

    # Celled-consult scaling evidence (r14, VERDICT r13 #1 done-criterion):
    # the SAME arrival stream gated against an IVFPQ artifact at 1x and at
    # 10x index rows with CONSTANT cell size (n_cells 8 → 80, the IVF
    # scaling rule), n_probe=4, prune_cells serve (semantic_anti_join's
    # celled path). Per-batch consult cost is n_probe × cell-size ×
    # judged-rows — independent of index size — so the 10x wall must stay
    # ~flat; the flat-PQ semantic_gate block above is the contrast (its
    # consult ADC-scans the WHOLE index per batch). The 10x corpus is the
    # 1x history replicated with OFFSET ids: identical distribution, so
    # index size is the dominant variable (kept counts can dip slightly —
    # an arriving doc whose id equals an indexed id is self-pair-excluded
    # against the original but not against its offset twins; the handful
    # of extra drops does not move the wall). One rep each — the
    # comparison is within-session and relative.
    bulk_delta_diag = {}
    celled_evidence = {}
    hist1 = emb.filter(F.col("vec_id") % 3 != 0).select("vec_id", "embedding")
    hist10 = hist1
    for _i in range(1, 10):
        hist10 = hist10.unionByName(
            hist1.select(
                (F.col("vec_id") + F.lit(_i * 10_000_000)).alias("vec_id"),
                "embedding",
            )
        )
    for _label, _corpus, _cells in (("1x", hist1, 8), ("10x", hist10, 80)):
        cd = tempfile.mkdtemp(prefix=f"bench_sem_celled_{_label}_")
        try:
            t0 = time.perf_counter()
            _ci = similarity.build_ivfpq_index(_corpus, n_cells=_cells)
            similarity.save_ivfpq_index(_ci, cd)
            _ci_build = round(time.perf_counter() - t0, 3)
            _ci.unpersist()
            spark.catalog.clearCache()
            row, _, _ = _run_stream_config(
                {
                    "semantic_threshold": 0.9,
                    "semantic_index": cd,
                    "semantic_n_probe": 4,
                },
                with_embeddings=True,
                reps=1,
            )
            row["index_rows"] = _corpus.count()
            row["n_cells"] = _cells
            row["index_build_sec"] = _ci_build
            celled_evidence[_label] = row

            if _label == "1x":
                # Bulk-delta semantic path (r14, VERDICT r13 #7): the
                # NIGHTLY shape — one curate_increment over a realistic
                # delta (documents % 3 == 0, embeddings attached where
                # the fixture has them) consulting the same celled
                # artifact. This is the measured number behind the
                # "bulk deltas belong to the celled path" claim.
                from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import (
                    curation as curation_ops,
                )

                _delta = (
                    docs_tbl.filter(F.col("doc_id") % 3 == 0)
                    .join(
                        emb.select(
                            F.col("vec_id").alias("doc_id"), "embedding"
                        ),
                        "doc_id",
                        "left",
                    )
                )
                _inc_dir = tempfile.mkdtemp(prefix="bench_sem_bulk_")
                try:
                    t0 = time.perf_counter()
                    _kept = curation_ops.curate_increment(
                        _delta,
                        _inc_dir,
                        neardup_threshold=None,
                        semantic_threshold=0.9,
                        semantic_index=cd,
                        semantic_n_probe=4,
                    ).count()
                    bulk_delta_diag = {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "rows_in": _delta.count(),
                        "rows_kept": _kept,
                        "index_rows": row["index_rows"],
                        "config": (
                            "curate_increment, exact dedup + celled "
                            "semantic gate (n_probe=4, prune_cells), "
                            "nightly-delta shape"
                        ),
                    }
                finally:
                    shutil.rmtree(_inc_dir, ignore_errors=True)
                spark.catalog.clearCache()
        finally:
            shutil.rmtree(cd, ignore_errors=True)
    streaming_bench["semantic_gate_celled"] = celled_evidence

    # Stage attribution for the chunked training export (VERDICT r7
    # Missing #3): noop-sink each subtree of training_export_chunks once —
    # curation, the embedding LSH anti-join, the full encoded export
    # (adds codebook train + PQ encode), the full chunked export (adds
    # the docs join + window materialization). Derived *_attrib fields
    # subtract the nested subtree, so the four stages sum to the total by
    # construction; single timings (not min-of-REPS) in one contiguous
    # stretch, so they share a noise window and the SPLIT is meaningful
    # even when the absolute numbers drift vs the headline min.
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans import (
        llmdata,
    )

    def _noop_time(build_fn) -> float:
        # takes a THUNK, not a DataFrame: _export_encoded runs an action at
        # CONSTRUCTION time (the persisted kept materialization + codebook
        # sample), and an already-built argument would leave that work
        # outside the timer (first cut measured encoded 0.54 s < its own
        # kept subtree 0.85 s — the attribution went negative)
        t0 = time.perf_counter()
        build_fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # un-timed warm pass of the full plan: the subtraction attribution
    # only works if every stage is measured at the same JIT/codegen
    # warmth — without it the first-timed subtree pays the whole compile
    # cost and later stages look too cheap
    llmdata.training_export_chunks(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    stage_fns = {
        "curated_corpus": lambda: llmdata.curated_corpus(spark, sf_dir),
        "lsh_anti_join": lambda: llmdata._export_kept(spark, sf_dir),
        "export_encoded_full": lambda: llmdata._export_encoded(spark, sf_dir),
        "chunks_full": lambda: llmdata.training_export_chunks(spark, sf_dir),
    }
    stage_t: dict = {}
    for _ in range(2):  # min-of-2 interleaved: stage deltas are sub-second
        # at small SFs, one stalled job flips an attribution negative
        for sname, fn in stage_fns.items():
            tt = _noop_time(fn)
            stage_t[sname] = min(tt, stage_t.get(sname, tt))
            spark.catalog.clearCache()
    t_curated = stage_t["curated_corpus"]
    t_kept = stage_t["lsh_anti_join"]
    t_encoded = stage_t["export_encoded_full"]
    t_chunks = stage_t["chunks_full"]
    export_stages = {
        **stage_t,
        # derived per-stage shares; clamped at 0 — a nested subtree timed
        # in a different noise window can measure marginally above its
        # superset, and a negative "stage cost" is measurement noise, not
        # attribution
        "pq_encode_attrib": max(round(t_encoded - t_curated - t_kept, 3), 0.0),
        "chunk_materialize_attrib": max(round(t_chunks - t_encoded, 3), 0.0),
        "export_encoded_shared_subtree": (
            "persisted cut point inside each query (computed ONCE per "
            "query since r8; pre-persist it ran twice — codebook-sample "
            "action + encode read); training_export and "
            "training_export_chunks are self-contained registry queries "
            "with clearCache between bench runs, so the subtree executes "
            "once in EACH query by design, not shared across them"
        ),
    }

    # Stage attribution for the nightly-delta pass (r9 headline addition):
    # the registered neardup_increment query runs TWO gate passes — the
    # historical bootstrap (2/3 of the corpus becomes keepers) and the
    # delta increment proper (1/3 checked against them). At 100 TB the
    # bootstrap happens once ever; the delta is the recurring nightly
    # cost, so the split is what capacity planning actually needs.
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import (
        dedup as _dedup_ops,
    )

    _docs = tables.load_table(spark, sf_dir, "documents")
    inc_stages: dict = {}
    for _ in range(2):  # min-of-2: sub-10s stages, one stall flips the split
        _idx = tempfile.mkdtemp(prefix="bench_neardup_inc_") + "/idx"
        t0 = time.perf_counter()
        _dedup_ops.neardup_increment(
            _docs.filter(F.col("doc_id") % 3 != 0), _idx, batch_id=0
        )
        t_boot = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        _dedup_ops.neardup_increment(
            _docs.filter(F.col("doc_id") % 3 == 0), _idx, batch_id=1
        )
        t_delta = round(time.perf_counter() - t0, 3)
        inc_stages["bootstrap"] = min(t_boot, inc_stages.get("bootstrap", t_boot))
        inc_stages["delta"] = min(t_delta, inc_stages.get("delta", t_delta))
        spark.catalog.clearCache()
    neardup_inc_stages = inc_stages

    # Coverage accounting for the capped Jaccard dedup: how many distinct
    # shingles the df cap drops this run. The cap is a documented recall
    # bound, and a bound that is never measured reads as "covered
    # everything" — so every bench run records it.
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.dedup import (
        shingle_df_stats,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
        JACCARD_MAX_SHINGLE_DF,
    )

    srow = shingle_df_stats(
        tables.load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        max_shingle_df=JACCARD_MAX_SHINGLE_DF,
    ).collect()[0]
    diagnostics = {
        "jaccard_shingle_df_cap": JACCARD_MAX_SHINGLE_DF,
        "jaccard_n_shingles": srow["n_shingles"],
        "jaccard_n_dropped": srow["n_dropped"],
        "jaccard_max_df": srow["max_df"],
    }

    total = round(sum(timings.values()), 3)
    subtotal_r1 = round(sum(v for n, v in timings.items() if n in R1_SET), 3)

    # Fixture vintage: hash of the testdata manifest (name+size of every
    # parquet file), so a mid-round fixture regeneration (BASELINE.md
    # "Fixture vintages") is detectable from the bench JSON alone.
    manifest = sorted(
        (f, os.path.getsize(os.path.join(sf_dir, f)))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    vintage = hashlib.md5(json.dumps(manifest).encode()).hexdigest()[:12]

    # The stdout line must stay SHORT: the driver captures a bounded tail of
    # it, and round 3's line (with cold_queries inlined) overflowed that
    # window, leaving BENCH_r03.json with parsed:null. Headline object only
    # on stdout; cold-pass timings and diagnostics go to a sidecar file.
    headline_obj = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "subtotal_r1_queries": subtotal_r1,
        "stress": stress,
        "ann_split": ann_split,
        "train_eval_side": train_eval_side,
        "streaming": streaming_bench,
        "reps": REPS,
        # Per-query number = MIN over REPS full interleaved passes (each
        # query's reps are minutes apart, so one host stall window cannot
        # poison both) — the same min-merge discipline tools/sf1_bench.py
        # applies across invocations (VERDICT r6 What's-wrong #4: a single
        # slow session must not masquerade as a regression; cross-check
        # cold-pass timings in BENCH_DIAG.json).
        "methodology": f"per-query min of {REPS} interleaved full passes",
        "vintage": vintage,
        "calibration_sec": calibration_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    sidecar = {
        "cold_queries": cold_timings,
        "diagnostics": diagnostics,
        "streaming_batches_ms": batch_ms,
        "streaming_full_stack_batches_ms": full_stack_batch_ms,
        "export_chunks_stages": export_stages,
        "neardup_increment_stages": neardup_inc_stages,
        "curate_increment_semantic_bulk": bulk_delta_diag,
        "vintage": vintage,
        "calibration_sec": calibration_sec,
        "manifest": manifest,
    }
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DIAG.json"
    )
    with open(sidecar_path, "w") as f:
        json.dump(sidecar, f, indent=1)
    print(json.dumps(headline_obj, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
