"""Distributed PCA (r11): moments pinned against numpy, components
orthonormal with descending variance, the k=dim projection is an isometry
(identical cosine neighbors), and layout independence holds to float
tolerance (the documented non-hash determinism trade)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import embeddings as emb_ops

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_moments_match_numpy(emb, X):
    n, mean, cov = emb_ops.embedding_moments(emb.coalesce(1), "embedding", DIM)
    assert n == len(X)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        cov, (X.T @ X) / len(X) - np.outer(X.mean(0), X.mean(0)),
        rtol=0, atol=1e-12,
    )


def test_moments_layout_independent_to_tolerance(emb):
    _, m1, c1 = emb_ops.embedding_moments(emb.coalesce(1), "embedding", DIM)
    _, m2, c2 = emb_ops.embedding_moments(emb.repartition(13), "embedding", DIM)
    np.testing.assert_allclose(m1, m2, rtol=0, atol=1e-9)
    np.testing.assert_allclose(c1, c2, rtol=0, atol=1e-9)


def test_pca_components_orthonormal_descending(emb):
    model = emb_ops.train_pca(emb, "embedding", DIM, k=16)
    C = np.asarray(model.components)
    np.testing.assert_allclose(C @ C.T, np.eye(16), rtol=0, atol=1e-8)
    ev = model.explained_variance
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    assert 0 < sum(model.explained_ratio()) <= 1.0 + 1e-9
    # sign canonicalization: largest-|coeff| entry is positive
    for row in C:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_matches_numpy(emb, X):
    model = emb_ops.train_pca(emb, "embedding", DIM, k=8)
    got = {
        r["vec_id"]: np.asarray(r["p"])
        for r in emb.select(
            "vec_id", emb_ops.project_expr("embedding", model).alias("p")
        ).collect()
    }
    C = np.asarray(model.components)
    mu = np.asarray(model.mean)
    want = (X - mu) @ C.T
    ids = sorted(got)
    G = np.asarray([got[i] for i in ids])
    np.testing.assert_allclose(G, np.round(want, 6), rtol=0, atol=2e-6)
    # projected per-dim variance tracks the eigenvalues
    np.testing.assert_allclose(
        want.var(axis=0), model.explained_variance, rtol=1e-6, atol=1e-9
    )


def test_full_rank_projection_is_isometry_for_neighbors(spark, emb):
    """k=dim PCA is a rotation (+ centering): cosine on centered vectors
    is unchanged, so the top-5 neighbor SETS in projected space match the
    centered-space brute-force exactly."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import similarity

    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    proj = emb.select(
        "vec_id",
        emb_ops.project_expr("embedding", model, round_to=None).alias("embedding"),
    )
    mu = F.array(*[F.lit(v) for v in model.mean])
    centered = emb.select(
        "vec_id",
        F.zip_with(
            F.col("embedding"), mu, lambda a, b: a.cast("double") - b
        ).alias("embedding"),
    )

    def top5(df):
        out = {}
        rows = similarity.topk_bruteforce(
            df.filter(F.col("vec_id") < 5), df, "embedding", "vec_id", k=5
        ).collect()
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    a, b = top5(proj), top5(centered)
    assert a == b


def test_pca_validates(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        emb_ops.train_pca(emb, "embedding", DIM, k=0)
    with pytest.raises(ValueError, match="k must be"):
        emb_ops.train_pca(emb, "embedding", DIM, k=DIM + 1)
    empty = spark.createDataFrame([], "embedding array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        emb_ops.embedding_moments(empty, "embedding", DIM)
    bad = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(Exception, match="vector length"):
        emb_ops.embedding_moments(bad, "embedding", DIM)


def test_moments_reject_null_elements_and_ragged_batches(spark, emb):
    """ADVICE r11: a NULL element arrives as None → NaN and silently
    poisons mean/cov (train_pca returns NaN components with no error);
    ragged lengths within one batch used to crash np.asarray BEFORE the
    intended length check ran. Both must raise the clear ValueError."""
    withnull = spark.createDataFrame(
        [([1.0] * DIM,), ([None] + [1.0] * (DIM - 1),)],
        "embedding array<double>",
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        emb_ops.embedding_moments(withnull, "embedding", DIM)
    # ragged WITHIN one partition/batch: the per-row build must reach the
    # length check instead of failing in a stacked asarray
    ragged = spark.createDataFrame(
        [([1.0] * DIM,), ([1.0] * (DIM - 3),)],
        "embedding array<double>",
    ).coalesce(1)
    with pytest.raises(Exception, match="vector length"):
        emb_ops.embedding_moments(ragged, "embedding", DIM)


# ── OPQ-lite (r12): eigenvalue allocation + orthogonal rotation ─────────────

def test_opq_allocation_is_balanced_permutation(spark, emb):
    import math

    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    m, sub = 8, DIM // 8
    comps = emb_ops.opq_eigen_allocate(model, m=m)
    # a permutation of the full basis, nothing lost or duplicated
    assert len(comps) == DIM
    orig = {tuple(c) for c in model.components}
    assert {tuple(c) for c in comps} == orig
    # balanced: the spread of per-subspace log-variance products under
    # the allocation is no worse than under the naive PCA ordering
    var = {tuple(c): v for c, v in zip(model.components, model.explained_variance)}
    def spread(cs):
        sums = [
            sum(math.log(max(var[tuple(c)], 1e-12)) for c in cs[s * sub:(s + 1) * sub])
            for s in range(m)
        ]
        return max(sums) - min(sums)
    # STRICT improvement (ADVICE r12): the fixture embeddings are
    # unit-scale, so every eigenvalue is < 1 — exactly the regime where
    # the pre-r13 raw-log-sum greedy silently degenerated to the naive
    # contiguous PCA ordering and passed a <= assertion with equality.
    assert all(v < 1.0 for v in model.explained_variance)
    assert spread(comps) < spread(model.components)


def test_opq_allocation_validates(spark, emb):
    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM // 2)
    with pytest.raises(ValueError, match="FULL-RANK"):
        emb_ops.opq_eigen_allocate(model, m=8)
    full = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    with pytest.raises(ValueError, match="not divisible"):
        emb_ops.opq_eigen_allocate(full, m=7)


def test_rotation_preserves_cosine(spark, emb):
    """rotate_expr is a pure orthogonal map (no centering): pairwise
    cosines in rotated space equal the original-space cosines to the
    round-6 expression tolerance — the property that makes the OPQ
    serve path's exact re-rank the SAME metric."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.similarity import cosine_expr

    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    comps = emb_ops.opq_eigen_allocate(model, m=8)
    rot = emb_ops.rotate_expr("embedding", comps, round_to=None)
    two = emb.limit(8).select("vec_id", "embedding", rot.alias("r"))
    a = two.alias("a").crossJoin(two.alias("b")).select(
        F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
        cosine_expr(F.col("a.embedding"), F.col("b.embedding")).alias("c0"),
        cosine_expr(F.col("a.r"), F.col("b.r")).alias("c1"),
    ).collect()
    for r in a:
        assert abs(r["c0"] - r["c1"]) < 1e-9, (r["ia"], r["ib"])


def test_rotate_pandas_matches_rotate_expr(spark, emb):
    """The Arrow-matmul rotation (r13 serve path) and the fold-expression
    rotation agree element-for-element after the shared round-6: same
    literal rotation rows, same JVM-side rounding; the only divergence
    channel is BLAS-vs-fold summation order, ~1 ulp under a 1e-6 grid.
    This is the featurizer-identity guarantee that lets the fast path
    replace rotate_expr in every OPQ build/serve without changing any
    code, score, or rank downstream."""
    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    comps = emb_ops.opq_eigen_allocate(model, m=8)
    rows = (
        emb.select(
            "vec_id",
            emb_ops.rotate_expr("embedding", comps).alias("e"),
            emb_ops.rotate_pandas("embedding", comps).alias("p"),
        )
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["e"] == r["p"], r["vec_id"]


def _recall_harness(spark, emb, n_probes=20, k=10):
    """(recall_fn, plain_pq_recall, model): exact top-k qrels over the
    first ``n_probes`` ids + a closure scoring any served result."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import similarity

    probes = emb.filter(F.col("vec_id") < n_probes)
    exact = similarity.topk_bruteforce(probes, emb, "embedding", "vec_id", k=k)
    want: dict = {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(res):
        got: dict = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & w) / len(w) for q, w in want.items()) / len(want)

    def rotated_pq_recall(comps):
        emb_r = emb.select(
            "vec_id", emb_ops.rotate_pandas("embedding", comps).alias("embedding")
        )
        books = similarity.train_pq_codebooks(emb_r, "embedding", "vec_id")
        return recall(similarity.topk_pq(
            emb_r.filter(F.col("vec_id") < n_probes), emb_r, "embedding",
            "vec_id", k=k, codebooks=books, refine=1,
        ))

    books_p = similarity.train_pq_codebooks(emb, "embedding", "vec_id")
    r_pq = recall(similarity.topk_pq(
        probes, emb, "embedding", "vec_id", k=k, codebooks=books_p, refine=1
    ))
    return rotated_pq_recall, r_pq


def test_opq_recall_wins_on_anisotropic_corpus(spark):
    """The OPQ promise (Ge et al. 2013) where it actually applies: a
    corpus with a DECAYING spectrum mixed by a random rotation — the
    shape of real text/image embeddings. At the same m=8 × 8-bit code
    budget and refine=1 (the ×4 re-rank would saturate both), the
    fill-aware balanced allocation (ADVICE r12) must beat BOTH plain PQ
    and the naive contiguous-PCA ordering the pre-r13 greedy silently
    degenerated to. Measured on this seed: balanced 0.775 vs plain
    0.675 vs contiguous 0.405 — the margins asserted sit well inside
    those gaps. The contiguous bound is the regression tripwire: a
    greedy that degenerates again fails by ~0.3, not by luck."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 3000
    scales = 0.90 ** np.arange(DIM)
    q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
    x = (rng.standard_normal((n, DIM)) * scales) @ q.T
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8).cache()
    try:
        rotated_pq_recall, r_pq = _recall_harness(spark, emb)
        model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
        r_opq = rotated_pq_recall(emb_ops.opq_eigen_allocate(model, m=8))
        r_contig = rotated_pq_recall(model.components)
        assert r_opq >= r_pq + 0.05, (r_opq, r_pq)
        assert r_opq >= r_contig + 0.20, (r_opq, r_contig)
    finally:
        emb.unpersist()


def test_opq_recall_non_inferior_on_isotropic_fixture(spark, emb):
    """On the repo's near-ISOTROPIC synthetic embeddings the spectrum is
    flat, so no allocation can systematically help — measured recalls
    (20 probes): plain 0.69, balanced 0.69, contiguous 0.69-0.72, all
    inside codebook-sampling noise. The honest pin is non-inferiority
    (within 0.08 of plain PQ — 1-2 neighbors at this probe count) plus
    the absolute floor; the pre-r13 `>= plain` assertion only ever
    passed because the degenerate allocation equalled the contiguous
    ordering (ADVICE r12 — the equality this test no longer hides
    behind). The promise itself is pinned where it is measurable:
    test_opq_recall_wins_on_anisotropic_corpus."""
    rotated_pq_recall, r_pq = _recall_harness(spark, emb)
    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    r_opq = rotated_pq_recall(emb_ops.opq_eigen_allocate(model, m=8))
    assert r_opq >= r_pq - 0.08, (r_opq, r_pq)
    assert r_opq >= 0.6  # absolute floor, the PQ pin's neighborhood


def test_similarity_topk_opq_deterministic(spark, sf_dir):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import similarity_topk_opq

    a = [tuple(r) for r in similarity_topk_opq(spark, sf_dir).collect()]
    b = [tuple(r) for r in similarity_topk_opq(spark, sf_dir).collect()]
    assert a == b and len(a) == 25  # 5 probes × k=5


def test_pca_artifact_roundtrip_and_corruption(spark, emb, tmp_path):
    """save_pca → load_pca is exact (parquet doubles); projections from
    the loaded model equal the trained model's bit-for-bit; corrupt
    artifacts (missing component, wrong meta cardinality) fail at load."""
    model = emb_ops.train_pca(emb, "embedding", DIM, k=8)
    path = str(tmp_path / "pca")
    emb_ops.save_pca(spark, model, path)
    loaded = emb_ops.load_pca(spark, path)
    assert loaded == model
    a = emb.select(emb_ops.project_expr("embedding", model).alias("p")).collect()
    b = emb.select(emb_ops.project_expr("embedding", loaded).alias("p")).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]
    # drop a component row → contiguity check fires
    rows = spark.read.parquet(path + "/components").filter("idx <> 3")
    rows.write.mode("overwrite").parquet(str(tmp_path / "pca2") + "/components")
    spark.read.parquet(path + "/meta").write.mode("overwrite").parquet(
        str(tmp_path / "pca2") + "/meta"
    )
    with pytest.raises(ValueError, match="corrupt PCA artifact"):
        emb_ops.load_pca(spark, str(tmp_path / "pca2"))


def test_opq_index_lifecycle_matches_inline_form(spark, emb):
    """build_opq_index → topk_opq (the production build/serve split)
    returns exactly the self-contained inline composition's rows — same
    rotation, same codebooks (deterministic training), same ADC +
    re-rank — and serve against a loaded PCA model artifact matches too
    (tmp-free: model passed explicitly)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import similarity

    probes = emb.filter(F.col("vec_id") < 3)
    model = emb_ops.train_pca(emb, "embedding", DIM, k=DIM)
    idx = emb_ops.build_opq_index(emb, dim=DIM, model=model, persist=False)
    served = [tuple(r) for r in emb_ops.topk_opq(probes, idx, k=5).collect()]

    comps = emb_ops.opq_eigen_allocate(model, m=8)
    rot = emb_ops.rotate_pandas("embedding", comps)
    emb_r = emb.select("vec_id", rot.alias("embedding"))
    books = similarity.train_pq_codebooks(emb_r, "embedding", "vec_id")
    inline = [
        tuple(r)
        for r in similarity.topk_pq(
            emb_r.filter(F.col("vec_id") < 3), emb_r, "embedding", "vec_id",
            k=5, codebooks=books,
        ).collect()
    ]
    assert served == inline and len(served) == 15
