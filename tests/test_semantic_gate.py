"""Streaming/batch semantic near-dup gate vs a frozen PQ/OPQ index (r13,
VERDICT r12 Next-round #7) + the durable ANN index artifacts it rides on.

The gate is CONSULT-ONLY: both twins drop arriving documents whose exact
re-ranked cosine against any indexed neighbor reaches the threshold;
registration of new keepers stays the nightly pq_index_add job's work.
Batch/stream parity is by shared definition (semantic_anti_join) and
pinned end-to-end here.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import (
    curation,
    embeddings as emb_ops,
    similarity,
)
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming import pipeline

DIM = 64


def _vecs(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, DIM))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _emb_df(spark, ids, mat):
    return spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    """300 indexed unit vectors, ids 1000..1299, persisted for the module."""
    mat = _vecs(300, seed=11)
    df = _emb_df(spark, range(1000, 1300), mat).persist()
    df.count()
    yield df, mat
    df.unpersist()


def test_pq_index_artifact_roundtrip_and_corruption(spark, corpus, tmp_path):
    df, _ = corpus
    idx = similarity.build_pq_index(df, persist=False)
    probes = df.limit(5)
    want = [tuple(r) for r in similarity.topk_pq(probes, index=idx, k=3).collect()]

    path = str(tmp_path / "pq_art")
    similarity.save_pq_index(idx, path)
    loaded = similarity.load_pq_index(spark, path)
    assert loaded.codebooks == idx.codebooks
    got = [tuple(r) for r in similarity.topk_pq(probes, index=loaded, k=3).collect()]
    assert got == want and len(got) == 15

    # corrupt: a missing codebook row fails at load, not as wrong ADC
    broken = str(tmp_path / "pq_broken")
    similarity.save_pq_index(idx, broken)
    spark.read.parquet(broken + "/codebooks").filter(
        "NOT (s = 3 AND j = 7)"
    ).write.mode("overwrite").parquet(str(tmp_path / "cb2"))
    spark.read.parquet(str(tmp_path / "cb2")).write.mode("overwrite").parquet(
        broken + "/codebooks"
    )
    with pytest.raises(ValueError, match="corrupt PQ index"):
        similarity.load_pq_index(spark, broken)
    # tombstoned index refuses to save (two sources of truth)
    pinned = similarity.build_pq_index(df)
    removed = similarity.pq_index_remove(
        pinned, df.limit(3).select("vec_id"), persist=False
    )
    with pytest.raises(ValueError, match="tombstones"):
        similarity.save_pq_index(removed, str(tmp_path / "nope"))
    removed.unpersist()


def test_opq_index_artifact_roundtrip_and_resolve(spark, corpus, tmp_path):
    df, _ = corpus
    model = emb_ops.train_pca(df, "embedding", DIM, k=DIM)
    idx = emb_ops.build_opq_index(df, dim=DIM, model=model, persist=False)
    probes = df.limit(5)
    want = [tuple(r) for r in emb_ops.topk_opq(probes, idx, k=3).collect()]

    path = str(tmp_path / "opq_art")
    emb_ops.save_opq_index(idx, path)
    loaded = emb_ops.load_opq_index(spark, path)
    assert loaded.components == idx.components
    got = [tuple(r) for r in emb_ops.topk_opq(probes, loaded, k=3).collect()]
    assert got == want and len(got) == 15

    # resolve_ann_index must sniff the OPQ marker — loading an OPQ
    # artifact as plain PQ would serve unrotated queries silently
    res = curation.resolve_ann_index(spark, path)
    assert isinstance(res, emb_ops.OPQIndex)
    res.pq.encoded.unpersist()
    # rotation corruption fails at load
    spark.read.parquet(path + "/rotation").filter("idx <> 5").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "rot2"))
    spark.read.parquet(str(tmp_path / "rot2")).write.mode("overwrite").parquet(
        path + "/rotation"
    )
    with pytest.raises(ValueError, match="corrupt OPQ index"):
        emb_ops.load_opq_index(spark, path)


def _doc_rows(ids, mat_or_none, text_of):
    rows = []
    for j, i in enumerate(ids):
        emb = (
            None
            if mat_or_none is None or mat_or_none[j] is None
            else [float(v) for v in mat_or_none[j]]
        )
        rows.append((int(i), text_of(i), emb))
    return rows


def _text(i):
    # ≥ 20 distinct tokens so the always-on repetition gate never fires
    return f"document {i} " + " ".join(f"w{i}x{j}" for j in range(24))


def test_semantic_anti_join_drops_near_dups_keeps_rest(spark, corpus):
    df, mat = corpus
    idx = similarity.build_pq_index(df, persist=False)
    # ids 1,2 duplicate indexed vectors exactly (cosine 1.0); id 3 is a
    # fresh random vector (max cosine vs 300 random unit vectors at dim
    # 64 stays far below 0.9); id 4 has no embedding → passes through
    fresh = _vecs(1, seed=99)[0]
    delta = spark.createDataFrame(
        _doc_rows([1, 2, 3, 4], [mat[10], mat[200], fresh, None], _text),
        "doc_id long, text string, embedding array<double>",
    )
    kept = curation.semantic_anti_join(
        delta, idx, "embedding", "doc_id", threshold=0.9
    )
    assert {r["doc_id"] for r in kept.collect()} == {3, 4}
    # threshold monotone: raising it only ADDS survivors
    kept_hi = curation.semantic_anti_join(
        delta, idx, "embedding", "doc_id", threshold=1.1
    )
    assert {r["doc_id"] for r in kept_hi.collect()} == {1, 2, 3, 4}


def test_semantic_gate_validation(spark, corpus, tmp_path):
    df, _ = corpus
    docs = spark.createDataFrame(
        [(1, _text(1))], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="semantic_index"):
        curation.curate_increment(
            docs, str(tmp_path / "i1"), neardup_threshold=None,
            semantic_threshold=0.9,
        )
    idx = similarity.build_pq_index(df, persist=False)
    with pytest.raises(ValueError, match="embedding"):
        curation.curate_increment(
            docs, str(tmp_path / "i2"), neardup_threshold=None,
            semantic_threshold=0.9, semantic_index=idx,
        )


def test_semantic_gate_registry_query_pins(spark, sf_dir):
    """The registered semantic_gate query on the fixture: every planted
    exact-copy dup (doc_id % 12 == 0, history vector verbatim) drops,
    every unplanted delta doc survives (natural max cosine ≈ 0.6 << the
    0.9 threshold), and reruns are identical."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import semantic_gate

    rows = semantic_gate(spark, sf_dir).collect()
    kept = {r["doc_id"] for r in rows}
    assert kept, "gate emptied the delta — threshold or plant broke"
    assert not {d for d in kept if d % 12 == 0 and any(r["judged"] for r in rows if r["doc_id"] == d)}
    # delta universe: doc_id % 3 == 0; planted = % 12 == 0 (judged only)
    assert all(d % 3 == 0 for d in kept)
    rerun = {r["doc_id"] for r in semantic_gate(spark, sf_dir).collect()}
    assert rerun == kept


def test_stream_semantic_gate_matches_batch_twin(spark, corpus, tmp_path):
    """End-to-end parity: a file-source stream with the semantic gate
    (index consumed as a saved ARTIFACT PATH — the restart shape) ships
    exactly the documents the batch twin keeps, across micro-batch
    boundaries. Distinct non-repetitive texts keep the text-space stages
    out of the verdict, so the kept-set IS the semantic gate's."""
    df, mat = corpus
    idx = similarity.build_pq_index(df, persist=False)
    art = str(tmp_path / "sem_idx")
    similarity.save_pq_index(idx, art)

    fresh = _vecs(3, seed=77)
    ids = [1, 2, 3, 4, 5, 6]
    embs = [mat[0], fresh[0], mat[150], fresh[1], None, fresh[2]]
    rows = _doc_rows(ids, embs, _text)

    src = str(tmp_path / "sem_src")
    os.makedirs(src)
    schema = "doc_id long, text string, embedding array<double>"
    spark.createDataFrame(rows[:3], schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:00:00"))
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows[3:], schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:01:00"))
    ).coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "sem_sink")
    q = pipeline.run_stream_curation(
        spark.readStream.schema(schema + ", ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        sink,
        str(tmp_path / "sem_ckpt"),
        semantic_threshold=0.9,
        semantic_index=art,
    )
    q.awaitTermination(120)
    stream_kept = {r["doc_id"] for r in spark.read.parquet(sink).collect()}

    batch = curation.curate_increment(
        spark.createDataFrame(rows, schema),
        str(tmp_path / "sem_batch_idx"),
        neardup_threshold=None,
        semantic_threshold=0.9,
        semantic_index=art,
    )
    batch_kept = {r["doc_id"] for r in batch.collect()}

    assert stream_kept == batch_kept == {2, 4, 5, 6}
    # multiple micro-batches actually ran (the gate served per batch)
    assert len([d for d in os.listdir(sink) if d.startswith("batch=")]) >= 2


# ── r14: celled (IVFADC) consult + artifact crash contracts ─────────────────


def test_ivfpq_index_artifact_roundtrip_resolve_and_corruption(
    spark, corpus, tmp_path
):
    df, _ = corpus
    idx = similarity.build_ivfpq_index(df, persist=False)
    probes = df.limit(5)
    want = [
        tuple(r)
        for r in similarity.topk_ivfpq(probes, index=idx, k=3).collect()
    ]

    path = str(tmp_path / "ivfpq_art")
    similarity.save_ivfpq_index(idx, path)
    loaded = similarity.load_ivfpq_index(spark, path)
    assert np.allclose(loaded.coarse, idx.coarse)
    assert all(np.allclose(a, b) for a, b in zip(loaded.books, idx.books))
    got = [
        tuple(r)
        for r in similarity.topk_ivfpq(probes, index=loaded, k=3).collect()
    ]
    assert got == want and len(got) == 15

    # resolve_ann_index dispatches on the meta kind row
    res = curation.resolve_ann_index(spark, path)
    assert isinstance(res, similarity.IVFPQIndex)
    res.encoded.unpersist()
    # an IVFPQ root refuses a plain PQ load (meta kind mismatch)
    with pytest.raises(ValueError, match="corrupt PQ index"):
        similarity.load_pq_index(spark, path)
    # coarse corruption fails at load, not as wrong cell probes
    spark.read.parquet(path + "/coarse").filter("cell <> 5").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "co2"))
    spark.read.parquet(str(tmp_path / "co2")).write.mode("overwrite").parquet(
        path + "/coarse"
    )
    with pytest.raises(ValueError, match="corrupt IVFPQ index"):
        similarity.load_ivfpq_index(spark, path)
    # tombstoned index refuses to save
    pinned = similarity.build_ivfpq_index(df)
    removed = similarity.ivfpq_index_remove(
        pinned, df.limit(3).select("vec_id"), persist=False
    )
    with pytest.raises(ValueError, match="tombstones"):
        similarity.save_ivfpq_index(removed, str(tmp_path / "nope"))
    removed.unpersist()


def test_opq_artifact_torn_write_fails_loudly(spark, corpus, tmp_path):
    """The ADVICE r13 crash contract: rotation + opq_meta are written
    BEFORE the PQ parts, so a save torn at any point fails at load —
    never a silently valid plain-PQ artifact served unrotated."""
    import shutil

    df, _ = corpus
    model = emb_ops.train_pca(df, "embedding", DIM, k=DIM)
    idx = emb_ops.build_opq_index(df, dim=DIM, model=model, persist=False)

    # a COMPLETE OPQ root refuses a direct plain-PQ load
    whole = str(tmp_path / "opq_whole")
    emb_ops.save_opq_index(idx, whole)
    with pytest.raises(ValueError, match="OPQ index artifact"):
        similarity.load_pq_index(spark, whole)

    # torn after the marker: PQ parts missing → every load path raises
    torn = str(tmp_path / "opq_torn")
    emb_ops.save_opq_index(idx, torn)
    shutil.rmtree(torn + "/meta")
    with pytest.raises(Exception):
        curation.resolve_ann_index(spark, torn)

    # corrupt (present but unreadable) opq_meta: the narrow sniff
    # PROPAGATES instead of silently falling back to plain PQ
    bad = str(tmp_path / "opq_badmeta")
    emb_ops.save_opq_index(idx, bad)
    shutil.rmtree(bad + "/opq_meta")
    os.makedirs(bad + "/opq_meta")
    with open(bad + "/opq_meta/garbage.parquet", "w") as f:
        f.write("not a parquet file")
    with pytest.raises(Exception) as ei:
        curation.resolve_ann_index(spark, bad)
    assert not isinstance(ei.value, AssertionError)


def test_semantic_anti_join_celled_matches_flat_and_recall_floor(
    spark, corpus
):
    """Celled consult (VERDICT r13 #1): an IVFPQ index gates the same
    planted near-dups as the flat PQ gate — an exact-copy query lands in
    its own vector's coarse cell by construction, so the celled probe
    always finds it — while fresh vectors and NULL embeddings survive
    both. Recall floor: the celled gate drops at least 90% of what the
    flat gate drops on a 30-dup plant (here exactly 100%)."""
    df, mat = corpus
    flat = similarity.build_pq_index(df, persist=False)
    celled = similarity.build_ivfpq_index(df, persist=False)

    dup_ids = list(range(1, 31))  # exact copies of indexed vectors
    fresh = _vecs(3, seed=123)
    ids = dup_ids + [41, 42, 43, 44]
    embs = [mat[7 * j % 300] for j in range(30)] + [
        fresh[0], fresh[1], fresh[2], None,
    ]
    delta = spark.createDataFrame(
        _doc_rows(ids, embs, _text),
        "doc_id long, text string, embedding array<double>",
    )
    kept_flat = {
        r["doc_id"]
        for r in curation.semantic_anti_join(
            delta, flat, "embedding", "doc_id", threshold=0.9
        ).collect()
    }
    kept_celled = {
        r["doc_id"]
        for r in curation.semantic_anti_join(
            delta, celled, "embedding", "doc_id", threshold=0.9, n_probe=4
        ).collect()
    }
    assert kept_flat == {41, 42, 43, 44}
    dropped_flat = set(ids) - kept_flat
    dropped_celled = set(ids) - kept_celled
    # fresh/NULL rows never drop in the celled gate either
    assert {41, 42, 43, 44} <= kept_celled
    # recall floor vs the flat gate
    assert len(dropped_celled & dropped_flat) >= 0.9 * len(dropped_flat)
    # exact-copy plants: the probe is guaranteed, so recall is exactly 1
    assert dropped_celled == dropped_flat


def test_stream_semantic_gate_celled_artifact_matches_batch_twin(
    spark, corpus, tmp_path
):
    """The celled gate end-to-end: a stream consulting a saved IVFPQ
    ARTIFACT (restart shape — coarse centroids + residual books + codes
    all load from disk) ships exactly the batch twin's kept set."""
    df, mat = corpus
    idx = similarity.build_ivfpq_index(df, persist=False)
    art = str(tmp_path / "sem_ivfpq_idx")
    similarity.save_ivfpq_index(idx, art)

    fresh = _vecs(3, seed=78)
    ids = [1, 2, 3, 4, 5, 6]
    embs = [mat[0], fresh[0], mat[150], fresh[1], None, fresh[2]]
    rows = _doc_rows(ids, embs, _text)

    src = str(tmp_path / "sem_ivfpq_src")
    os.makedirs(src)
    schema = "doc_id long, text string, embedding array<double>"
    spark.createDataFrame(rows[:3], schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:00:00"))
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows[3:], schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:01:00"))
    ).coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "sem_ivfpq_sink")
    q = pipeline.run_stream_curation(
        spark.readStream.schema(schema + ", ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        sink,
        str(tmp_path / "sem_ivfpq_ckpt"),
        semantic_threshold=0.9,
        semantic_index=art,
        semantic_n_probe=4,
    )
    q.awaitTermination(120)
    stream_kept = {r["doc_id"] for r in spark.read.parquet(sink).collect()}

    batch = curation.curate_increment(
        spark.createDataFrame(rows, schema),
        str(tmp_path / "sem_ivfpq_batch_idx"),
        neardup_threshold=None,
        semantic_threshold=0.9,
        semantic_index=art,
        semantic_n_probe=4,
    )
    batch_kept = {r["doc_id"] for r in batch.collect()}

    assert stream_kept == batch_kept == {2, 4, 5, 6}


# ── r14: streaming keeper registration (VERDICT r13 #4) ─────────────────────


def test_stream_semantic_register_within_run_and_batch_twin(
    spark, corpus, tmp_path
):
    """semantic_register=True closes the consult-only gap: a keeper
    shipped in micro-batch N is registered under <index>/stream_adds, so
    its semantic dup arriving in batch N+1 DROPS within the same run —
    and the batch twin (curate_increment + pq_index_add registration
    between deltas) keeps exactly the same documents."""
    import time

    df, mat = corpus
    idx = similarity.build_pq_index(df, persist=False)
    art = str(tmp_path / "reg_idx")
    similarity.save_pq_index(idx, art)

    fresh = _vecs(3, seed=301)
    b1 = _doc_rows([1, 2], [fresh[0], fresh[1]], _text)
    # doc 3 duplicates doc 1's vector exactly; doc 4 is fresh
    b2 = _doc_rows([3, 4], [fresh[0], fresh[2]], _text)
    schema = "doc_id long, text string, embedding array<double>"

    src = str(tmp_path / "reg_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:00:00"))
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(b2, schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:01:00"))
    ).coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "reg_sink")
    q = pipeline.run_stream_curation(
        spark.readStream.schema(schema + ", ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        sink,
        str(tmp_path / "reg_ckpt"),
        semantic_threshold=0.9,
        semantic_index=art,
        semantic_register=True,
    )
    q.awaitTermination(120)
    stream_kept = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert stream_kept == {1, 2, 4}, stream_kept

    # registrations landed under the reservation protocol
    adds = similarity._stream_adds_df(spark, art)
    assert adds is not None
    assert {r["neighbor_id"] for r in adds.collect()} == {1, 2, 4}
    # a CONSULT-ONLY gate over the frozen base would have kept doc 3
    base_only = similarity.load_pq_index(
        spark, art, include_stream_adds=False
    )
    delta2 = spark.createDataFrame(b2, schema)
    assert {
        r["doc_id"]
        for r in curation.semantic_anti_join(
            delta2, base_only, "embedding", "doc_id", 0.9
        ).collect()
    } == {3, 4}
    # artifact loads serve the registered keepers (restart/batch shape)
    reloaded = curation.resolve_ann_index(spark, art)
    assert {
        r["doc_id"]
        for r in curation.semantic_anti_join(
            delta2, reloaded, "embedding", "doc_id", 0.9
        ).collect()
    } == {4}
    reloaded.encoded.unpersist()

    # batch twin: curate delta1 → register keepers → curate delta2
    art2 = str(tmp_path / "reg_twin_idx")
    similarity.save_pq_index(idx, art2)
    d1 = curation.curate_increment(
        spark.createDataFrame(b1, schema), str(tmp_path / "twin_i1"),
        neardup_threshold=None, semantic_threshold=0.9, semantic_index=art2,
    )
    kept1 = d1.persist()
    assert {r["doc_id"] for r in kept1.collect()} == {1, 2}
    base2 = similarity.load_pq_index(
        spark, art2, include_stream_adds=False
    )
    similarity.pq_index_add(
        base2,
        kept1.filter(F.col("embedding").isNotNull()).select(
            "doc_id", "embedding"
        ),
        vec_col="embedding",
        id_col="doc_id",
        path=art2 + "/encoded",
    )
    kept1.unpersist()
    d2 = curation.curate_increment(
        spark.createDataFrame(b2, schema), str(tmp_path / "twin_i2"),
        neardup_threshold=None, semantic_threshold=0.9, semantic_index=art2,
    )
    assert {r["doc_id"] for r in d2.collect()} == {4}


def test_semantic_register_protocol_idempotent_and_promote(
    spark, corpus, tmp_path
):
    """The registration protocol at the primitive level (mirroring the
    near-dup gate suite), on a CELLED index: re-delivery reuses its
    reserved id, consults exactly the history its first delivery saw
    (own epoch excluded — mutual within-batch dups stay kept), and
    overwrites its own dir without doubling rows; promote_stream_adds
    folds everything into the base and is a no-op the second time."""
    import dataclasses

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming.pipeline import _gate_batch_id

    df, mat = corpus
    art = str(tmp_path / "proto_idx")
    similarity.save_ivfpq_index(
        similarity.build_ivfpq_index(df, persist=False), art
    )
    base = similarity.load_ivfpq_index(
        spark, art, include_stream_adds=False
    )
    schema = "doc_id long, text string, embedding array<double>"
    tok = "aabbccdd"

    def consult(reg_id):
        adds = similarity._stream_adds_df(spark, art)
        if adds is None:
            return base
        return dataclasses.replace(
            base,
            encoded=base.encoded.unionByName(
                adds.filter(F.col("batch") != reg_id).drop("batch")
            ),
        )

    def run_epoch(epoch, rows):
        reg_id = _gate_batch_id(spark, art + "/stream_adds", tok, epoch)
        kept = curation.semantic_anti_join(
            spark.createDataFrame(rows, schema), consult(reg_id),
            "embedding", "doc_id", 0.9, n_probe=4,
        ).persist()
        similarity.encode_for_index(
            base,
            kept.filter(F.col("embedding").isNotNull()).select(
                "doc_id", "embedding"
            ),
            vec_col="embedding",
            id_col="doc_id",
        ).write.mode("overwrite").parquet(
            f"{art}/stream_adds/batch={reg_id}"
        )
        out = {r["doc_id"] for r in kept.collect()}
        kept.unpersist()
        return reg_id, out

    g, h = _vecs(2, seed=302)
    # epoch 0: docs 11, 12 are MUTUAL dups (same fresh vector) — the gate
    # only judges against the index, so both ship and both register
    e0_rows = _doc_rows([11, 12], [g, g], _text)
    id0, kept0 = run_epoch(0, e0_rows)
    assert kept0 == {11, 12}
    # epoch 1: a dup of the epoch-0 keeper drops; a fresh doc ships
    id1, kept1 = run_epoch(1, _doc_rows([13, 14], [g, h], _text))
    assert kept1 == {14} and id1 == id0 + 1

    # re-delivery of epoch 0: same reserved id, same kept set (own epoch
    # excluded — 11/12 must NOT drop against their own registrations),
    # no row doubling
    id0r, kept0r = run_epoch(0, e0_rows)
    assert id0r == id0 and kept0r == kept0
    adds = similarity._stream_adds_df(spark, art)
    assert adds.count() == 3  # 11, 12, 14 — overwrite, not append

    # an index loaded WITH live stream_adds refuses durable appends —
    # the registration rows live outside <root>/encoded
    with_adds = similarity.load_ivfpq_index(spark, art)
    with pytest.raises(ValueError, match="does not read from that path"):
        similarity.ivfpq_index_add(
            with_adds,
            spark.createDataFrame(
                [(99, [float(x) for x in h])],
                "vec_id long, embedding array<double>",
            ),
            path=art + "/encoded",
        )

    # promote: folds 3 registrations into the base, clears stream_adds,
    # and the promoted index still gates the keepers' dups
    n = similarity.promote_stream_adds(spark, art)
    assert n == 3
    assert similarity._stream_adds_df(spark, art) is None
    assert not os.path.exists(art + "/stream_adds")
    assert similarity.promote_stream_adds(spark, art) == 0
    promoted = curation.resolve_ann_index(spark, art)
    still = curation.semantic_anti_join(
        spark.createDataFrame(_doc_rows([21, 22], [g, h], _text), schema),
        promoted, "embedding", "doc_id", 0.9, n_probe=4,
    )
    assert {r["doc_id"] for r in still.collect()} == set()
    promoted.encoded.unpersist()


def test_semantic_register_opq_featurizer_identity(spark, corpus, tmp_path):
    """OPQ registration must encode with the index's OWN rotation
    (featurizer identity): a keeper registered through encode_for_index
    gates its later dup exactly like a base-indexed vector."""
    df, mat = corpus
    model = emb_ops.train_pca(df, "embedding", DIM, k=DIM)
    idx = emb_ops.build_opq_index(df, dim=DIM, model=model, persist=False)
    art = str(tmp_path / "opq_reg_idx")
    emb_ops.save_opq_index(idx, art)
    base = emb_ops.load_opq_index(spark, art, include_stream_adds=False)

    g = _vecs(1, seed=303)[0]
    keeper = spark.createDataFrame(
        [(31, [float(x) for x in g])], "doc_id long, embedding array<double>"
    )
    similarity.encode_for_index(
        base, keeper, vec_col="embedding", id_col="doc_id"
    ).write.mode("overwrite").parquet(art + "/stream_adds/batch=0")

    reloaded = curation.resolve_ann_index(spark, art)
    schema = "doc_id long, text string, embedding array<double>"
    kept = curation.semantic_anti_join(
        spark.createDataFrame(
            _doc_rows([32, 33], [g, _vecs(1, seed=304)[0]], _text), schema
        ),
        reloaded, "embedding", "doc_id", 0.9,
    )
    assert {r["doc_id"] for r in kept.collect()} == {33}
    reloaded.pq.encoded.unpersist()
