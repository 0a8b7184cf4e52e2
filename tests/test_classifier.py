"""Model-based quality classifier (r11): the dense FineWeb-Edu-style
linear probe and the fastText-style hashed sparse model, both trained by
distributed full-batch GD whose iterates are pinned EXACTLY against a
pure-Python reference (same left-fold dot products, same scale-8
decimal-quantized contribution sums — the dsum discipline replayed with
``decimal.Decimal``)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import classifier
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
    CLF_DIM,
    CLF_TARGET_U,
    classifier_probe_eval,
)

_Q = Decimal(1).scaleb(-classifier.GRAD_SCALE)


def _ds(vals):
    """Python mirror of functions/coercion.dsum at GRAD_SCALE: Spark casts
    each double to DECIMAL(28,8) via BigDecimal.valueOf (shortest decimal
    repr — which is what ``repr(float)`` also produces), HALF_UP, sums
    exactly in decimal, casts back to the nearest double."""
    tot = Decimal(0)
    for v in vals:
        tot += Decimal(repr(v)).quantize(_Q, ROUND_HALF_UP)
    return float(tot)


def _py_train_dense(X, y, dim, n_iters, lr):
    w = [0.0] * dim
    b = 0.0
    n = len(X)
    hist = []
    for _ in range(n_iters):
        rs, losses = [], []
        for xi, yi in zip(X, y):
            acc = 0.0
            for j in range(dim):
                acc = acc + xi[j] * w[j]
            z = acc + b
            p = 1.0 / (1.0 + math.exp(-z))
            rs.append(p - yi)
            losses.append(
                -(yi * math.log(max(p, 1e-12)) + (1.0 - yi) * math.log(max(1.0 - p, 1e-12)))
            )
        grads = [_ds([rs[i] * X[i][j] for i in range(n)]) for j in range(dim)]
        gb = _ds(rs)
        w = [w[j] - lr * (grads[j] / n) for j in range(dim)]
        b = b - lr * (gb / n)
        hist.append(_ds(losses) / n)
    return w, b, hist


@pytest.fixture(scope="module")
def probe_data(spark, sf_dir):
    """Deterministic doubles on BOTH sides: collect the fixture
    embeddings once, label with the hyperplane in pure Python, and feed
    Spark the exact same doubles via createDataFrame."""
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    data = []
    for r in rows:
        x = [float(v) for v in r["embedding"]]
        acc = 0.0
        for j in range(CLF_DIM):
            acc = acc + x[j] * CLF_TARGET_U[j]
        data.append((int(r["vec_id"]), x, 1.0 if acc > 0 else 0.0))
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, y double"
    )
    return data, df


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_dense_trainer_matches_python_reference_exactly(spark, probe_data, mode):
    # BOTH formulations (r14: mode="driver" collects the bounded probe set
    # and replays the iterates in numpy; "distributed" is the per-iteration
    # aggregation loop) must reproduce the pure-Python reference EXACTLY —
    # same left-fold dots, same libm sigmoid/log, same scale-8 decimal sums.
    data, df = probe_data
    X = [d[1] for d in data]
    y = [d[2] for d in data]
    w, b, hist = classifier.train_logreg_dense(
        df, "embedding", "y", dim=CLF_DIM, n_iters=4, lr=40.0, mode=mode
    )
    pw, pb, phist = _py_train_dense(X, y, CLF_DIM, n_iters=4, lr=40.0)
    assert w == pw
    assert b == pb
    assert hist == pytest.approx(phist, abs=1e-12)


def test_dense_trainer_modes_identical_and_auto_dispatch(spark, probe_data):
    """mode='driver' ≡ mode='distributed' bit-for-bit on the fixtures
    (weights, bias AND loss history — the r14 auto-dispatch contract);
    'auto' under a tiny max_driver_rows falls back to the distributed
    loop, and an explicit 'driver' above the bound refuses loudly."""
    data, df = probe_data
    wd, bd, hd = classifier.train_logreg_dense(
        df, "embedding", "y", dim=CLF_DIM, n_iters=6, lr=40.0,
        mode="distributed",
    )
    wv, bv, hv = classifier.train_logreg_dense(
        df, "embedding", "y", dim=CLF_DIM, n_iters=6, lr=40.0, mode="driver"
    )
    assert wd == wv and bd == bv and hd == hv
    wa, ba, ha = classifier.train_logreg_dense(
        df, "embedding", "y", dim=CLF_DIM, n_iters=6, lr=40.0,
        mode="auto", max_driver_rows=1,
    )
    assert wa == wd and ba == bd and ha == hd
    with pytest.raises(ValueError, match="refuses to collect"):
        classifier.train_logreg_dense(
            df, "embedding", "y", dim=CLF_DIM, n_iters=1, lr=40.0,
            mode="driver", max_driver_rows=1,
        )


def test_dsum_scale8_py_matches_decimal_reference():
    """The vectorized fast path of the driver trainer's quantized sum must
    agree with the exact Decimal mirror on adversarial values: exact .5e-8
    ties (HALF_UP away from zero), negatives, zeros, near-tie dust around
    the boundary, and large magnitudes."""
    cases = [
        [0.0, -0.0, 1.0, -1.0],
        [1.5e-8, -1.5e-8, 2.5e-8, -2.5e-8],  # repr ties at the 8th decimal
        [0.123456785, -0.123456785, 0.123456784999999, 0.12345678500000001],
        [3.14159265358979, -2.718281828459045, 1e-12, -1e-12],
        [27.6310211159285, -27.6310211159285],  # log-loss clamp magnitudes
        [1234.56789012345, -9876.54321098765],
    ]
    for vals in cases:
        assert classifier._dsum_scale8_py(vals) == _ds(vals), vals


def test_dsum_scale8_py_large_magnitude_near_ties():
    """ADVICE r14: the f64 product error of |v|·1e8 grows with |v|, so the
    tie window must widen with magnitude — the fixed 1e-5 window rounded
    5305917.800537865 differently from Spark's double→decimal(28,8) cast.
    Pins the exact repro plus near-tie dust across magnitudes 1e3..1e7."""
    import random

    assert classifier._dsum_scale8_py([5305917.800537865]) == _ds(
        [5305917.800537865]
    )
    rng = random.Random(7)
    for _ in range(500):
        mag = 10 ** rng.uniform(3, 7.9)
        v = round(rng.uniform(0, mag), 8) + rng.choice([-1, 1]) * rng.uniform(
            0, 3e-9
        )
        v *= rng.choice([-1.0, 1.0])
        assert classifier._dsum_scale8_py([v]) == _ds([v]), repr(v)


def test_dsum_scale8_py_sum_overflow_safe():
    """ADVICE r14: each scaled element is bounded by the 9e15 rail but the
    int64 SUM of many mid-size values wraps past 2⁶³ — the chunked
    accumulation must return the exact decimal sum, not a wrapped one."""
    vals = [8.9e7 - 1] * 200_000
    assert classifier._dsum_scale8_py(vals) == _ds(vals) == 17_799_999_800_000.0
    import random

    rng = random.Random(11)
    vals = [8.9e7 * rng.uniform(0.5, 1.0) for _ in range(100_000)]
    assert classifier._dsum_scale8_py(vals) == _ds(vals)


def test_dense_trainer_loss_decreases_and_learns(spark, probe_data):
    data, df = probe_data
    train = df.filter(F.col("vec_id") % 5 != 0)
    w, b, hist = classifier.train_logreg_dense(
        train, "embedding", "y", dim=CLF_DIM, n_iters=40, lr=40.0
    )
    assert hist[-1] < hist[0]
    assert all(h > 0 for h in hist)
    scored = df.select(
        "vec_id",
        "y",
        (classifier.score_linear(w, b) >= 0.5).cast("double").alias("p"),
    )
    acc = scored.agg(
        F.avg((F.col("p") == F.col("y")).cast("double")).alias("a"),
        F.avg(
            F.when(F.col("vec_id") % 5 == 0, (F.col("p") == F.col("y")).cast("double"))
        ).alias("ho"),
    ).collect()[0]
    assert acc["a"] >= 0.90  # overall (mostly train fit)
    assert acc["ho"] >= 0.75  # generalizes to the held-out ids


def test_probe_eval_query_confusion_matrix(spark, sf_dir):
    rows = {r["split"]: r for r in classifier_probe_eval(spark, sf_dir).collect()}
    assert set(rows) == {"train", "holdout"}
    for r in rows.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n"]
        assert abs((r["tp"] + r["tn"]) / r["n"] - r["accuracy"]) < 1e-3
    assert rows["train"]["accuracy"] >= 0.95
    assert rows["holdout"]["accuracy"] >= 0.75


def test_fixture_labels_not_linearly_separable_documented(spark, sf_dir):
    """Why the probe target is a hyperplane and not the fixtures' `label`
    column: a linear head cannot beat chance on label>=5 (measured — this
    pins the design note in plans/llmdata.py against fixture drift)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        (F.col("label") >= 5).cast("double").alias("y"),
    )
    w, b, _ = classifier.train_logreg_dense(
        df, "embedding", "y", dim=CLF_DIM, n_iters=25, lr=40.0
    )
    acc = df.agg(
        F.avg(
            ((classifier.score_linear(w, b) >= 0.5).cast("double") == F.col("y")).cast("double")
        )
    ).collect()[0][0]
    assert acc < 0.80  # far from the hyperplane target's 0.95+


def test_dense_trainer_validates(spark):
    df = spark.createDataFrame([], "embedding array<double>, y double")
    with pytest.raises(ValueError, match="empty"):
        classifier.train_logreg_dense(df, "embedding", "y", dim=2)
    df2 = spark.createDataFrame([([1.0, 0.0], 1.0)], "embedding array<double>, y double")
    with pytest.raises(ValueError, match="n_iters"):
        classifier.train_logreg_dense(df2, "embedding", "y", dim=2, n_iters=0)


# ── sparse hashed-feature model ─────────────────────────────────────────────

SPARSE_CORPUS = [
    (1, "spark shuffle join spark", 1.0),
    (2, "merge rows batch", 0.0),
    (3, "spark window", 1.0),
    (4, "batch rows rows merge", 0.0),
    (5, "join spark spark spark batch", 1.0),
    (6, "window merge window", 0.0),
    (7, "spark", 1.0),
    (8, "rows", 0.0),
]


def _sparse_frames(spark, n_buckets=64):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        dsir_bucket_rows,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in SPARSE_CORPUS], ["id", "text"]
    )
    feats = (
        dsir_bucket_rows(docs, "text", id_col="id", n_buckets=n_buckets)
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("double").alias("x"))
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in SPARSE_CORPUS], ["id", "y"]
    )
    return feats, labels


def _py_train_sparse(feats, labels, n_iters, lr):
    """Mirror of train_logreg_hashed: same bias feature, same scale-8
    decimal sums for margins and gradients, same double update order."""
    ids = sorted(labels)
    by_id = {i: dict(fs) for i, fs in feats.items()}
    for i in ids:
        by_id.setdefault(i, {})[classifier.BIAS_BUCKET] = 1.0
    n = len(ids)
    w: dict[int, float] = {}
    for _ in range(n_iters):
        rs = {}
        for i in ids:
            z = _ds([x * w.get(bkt, 0.0) for bkt, x in by_id[i].items()])
            rs[i] = 1.0 / (1.0 + math.exp(-z)) - labels[i]
        buckets = sorted({b for i in ids for b in by_id[i]} | set(w))
        for bkt in buckets:
            g = _ds([rs[i] * by_id[i][bkt] for i in ids if bkt in by_id[i]]) / n
            w[bkt] = w.get(bkt, 0.0) - lr * g
    return w


def test_sparse_trainer_matches_python_reference_exactly(spark):
    feats, labels = _sparse_frames(spark)
    got = {
        r["bucket"]: r["w"]
        for r in classifier.train_logreg_hashed(feats, labels, n_iters=3, lr=2.0).collect()
    }
    pf = {}
    for r in feats.collect():
        pf.setdefault(r["id"], []).append((r["bucket"], r["x"]))
    want = _py_train_sparse(pf, {i: y for i, _, y in SPARSE_CORPUS}, n_iters=3, lr=2.0)
    # trainer materializes every touched bucket (incl. zero-gradient ones)
    assert set(got) == set(want)
    for bkt in want:
        assert got[bkt] == want[bkt], bkt


def test_sparse_trainer_learns_token_signal(spark):
    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=30, lr=5.0)
    scored = classifier.score_hashed(feats, labels, w)
    joined = labels.join(scored, "id")
    acc = joined.agg(
        F.avg(((F.col("score") >= 0.5).cast("double") == F.col("y")).cast("double"))
    ).collect()[0][0]
    assert acc == 1.0  # 'spark'-bearing docs fully separable


def test_score_hashed_bias_only_for_featureless_id(spark):
    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=5, lr=2.0)
    ghost = spark.createDataFrame([(99, 0.0)], ["id", "y"])
    s = classifier.score_hashed(feats, ghost, w).collect()
    assert len(s) == 1 and s[0]["id"] == 99
    bias_w = {r["bucket"]: r["w"] for r in w.collect()}[classifier.BIAS_BUCKET]
    want = round(1.0 / (1.0 + math.exp(-round(_ds([1.0 * bias_w]), 6))), 6)
    assert s[0]["score"] == pytest.approx(want, abs=1e-9)


def test_score_hashed_expr_matches_join_path(spark):
    """The literal-map fold gate and the join+decimal-sum bulk path agree
    to float-fold precision after the shared round-6 margin pin."""
    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=10, lr=2.0)
    wmap, bias = classifier.collect_hashed_model(w)
    docs = spark.createDataFrame([(i, t) for i, t, _ in SPARSE_CORPUS], ["id", "text"])
    expr_scores = {
        r["id"]: r["s"]
        for r in docs.select(
            "id",
            classifier.score_hashed_expr(F.col("text"), wmap, bias, 64).alias("s"),
        ).collect()
    }
    join_scores = {
        r["id"]: r["score"]
        for r in classifier.score_hashed(feats, labels, w).collect()
    }
    assert set(expr_scores) == set(join_scores)
    for i in expr_scores:
        assert expr_scores[i] == pytest.approx(join_scores[i], abs=2e-6), i


def test_collect_hashed_model_bounded(spark):
    rows = [(b, 0.1) for b in range(20)] + [(classifier.BIAS_BUCKET, -0.5)]
    w = spark.createDataFrame(rows, "bucket int, w double")
    wmap, bias = classifier.collect_hashed_model(w, max_buckets=30)
    assert bias == -0.5 and len(wmap) == 20
    with pytest.raises(ValueError, match="max_buckets"):
        classifier.collect_hashed_model(w, max_buckets=10)


def test_score_hashed_expr_bias_only_model(spark):
    docs = spark.createDataFrame([(1, "anything")], ["id", "text"])
    s = docs.select(
        classifier.score_hashed_expr(F.col("text"), {}, 1.0, 64).alias("s")
    ).collect()[0]["s"]
    assert s == pytest.approx(1.0 / (1.0 + math.exp(-1.0)), abs=1e-6)


def test_dense_trainer_rejects_null_labels_and_bad_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], 1.0), ([0.0, 1.0], None)],
        "embedding array<double>, y double",
    )
    with pytest.raises(ValueError, match="NULL label"):
        classifier.train_logreg_dense(df, "embedding", "y", dim=2, n_iters=1)
    df2 = spark.createDataFrame(
        [([1.0, 0.0], 1.0), ([0.0], 0.0), (None, 1.0)],
        "embedding array<double>, y double",
    )
    with pytest.raises(ValueError, match="length != dim"):
        classifier.train_logreg_dense(df2, "embedding", "y", dim=2, n_iters=1)


def test_dense_trainer_rejects_null_elements_inside_vectors(spark):
    """ADVICE r11: one NULL element nulls the whole dot fold — the row's
    entire contribution array would silently drop from the gradient sums
    while still counting in n. The guard must flag it, not just NULL
    labels / wrong lengths."""
    df = spark.createDataFrame(
        [([1.0, 0.0], 1.0), ([None, 1.0], 0.0)],
        "embedding array<double>, y double",
    )
    with pytest.raises(ValueError, match="NULL element"):
        classifier.train_logreg_dense(df, "embedding", "y", dim=2, n_iters=1)


def test_score_hashed_expr_null_text_scores_bias_only(spark):
    """ADVICE r11: NULL text must score sigmoid(bias) in the expression
    gate — the join path (score_hashed) scores a featureless id
    bias-only, and the documented parity contract covers NULL text too
    (a gate returning NULL would silently drop those docs)."""
    wmap = {3: 0.7, 5: -0.2}
    bias = 0.4
    docs = spark.createDataFrame([(1, None)], "id long, text string")
    s = docs.select(
        classifier.score_hashed_expr(F.col("text"), wmap, bias, 64).alias("s")
    ).collect()[0]["s"]
    assert s == pytest.approx(1.0 / (1.0 + math.exp(-bias)), abs=1e-6)


def test_sparse_trainer_rejects_null_labels(spark):
    feats = spark.createDataFrame([(1, 3, 1.0)], "id long, bucket int, x double")
    labels = spark.createDataFrame(
        [(1, 1.0), (2, None)], "id long, y double"
    )
    with pytest.raises(ValueError, match="NULL"):
        classifier.train_logreg_hashed(feats, labels, n_iters=1)


# ── durable model artifacts (r12) ───────────────────────────────────────────

def test_dense_model_roundtrip_and_serve_parity(spark, tmp_path):
    """save → load → serve ≡ serve(trained) bit-exactly (parquet doubles
    roundtrip; score_linear folds the same literals either way)."""
    df = spark.createDataFrame(
        [([1.0, 0.0, 2.0], 1.0), ([0.0, 1.0, -1.0], 0.0),
         ([2.0, 0.5, 0.25], 1.0), ([-1.0, 2.0, 0.0], 0.0)],
        "embedding array<double>, y double",
    )
    w, b, _ = classifier.train_logreg_dense(df, "embedding", "y", dim=3, n_iters=5)
    path = str(tmp_path / "dense_model")
    classifier.save_dense_model(spark, w, b, path)
    w2, b2 = classifier.load_dense_model(spark, path)
    assert w2 == w and b2 == b
    s1 = df.select(classifier.score_linear(w, b).alias("s")).collect()
    s2 = df.select(classifier.score_linear(w2, b2).alias("s")).collect()
    assert [r["s"] for r in s1] == [r["s"] for r in s2]


def test_hashed_model_roundtrip_and_serve_parity(spark, tmp_path):
    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=5, lr=2.0)
    path = str(tmp_path / "hashed_model")
    classifier.save_hashed_model(w, 64, path, seed=0)
    w2, nb, seed = classifier.load_hashed_model(spark, path)
    assert (nb, seed) == (64, 0)
    trained = {(r["bucket"], r["w"]) for r in w.collect()}
    loaded = {(r["bucket"], r["w"]) for r in w2.collect()}
    assert trained == loaded
    s1 = {r["id"]: r["score"] for r in classifier.score_hashed(feats, labels, w).collect()}
    s2 = {r["id"]: r["score"] for r in classifier.score_hashed(feats, labels, w2).collect()}
    assert s1 == s2


def test_model_artifact_corruption_detected(spark, tmp_path):
    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=2)
    hp = str(tmp_path / "h")
    classifier.save_hashed_model(w, 64, hp)
    # wrong-kind load
    with pytest.raises(ValueError, match="kind"):
        classifier.load_dense_model(spark, hp)
    # dense artifact with a hole in the positions
    dp = str(tmp_path / "d")
    classifier.save_dense_model(spark, [0.1, 0.2, 0.3], -0.5, dp)
    spark.createDataFrame(
        [(0, 0.1), (2, 0.3), (classifier.BIAS_BUCKET, -0.5)], "pos int, w double"
    ).write.mode("overwrite").parquet(dp + "/weights")
    with pytest.raises(ValueError, match="corrupt dense model"):
        classifier.load_dense_model(spark, dp)
    # meta with the wrong cardinality
    mp = str(tmp_path / "m")
    classifier.save_hashed_model(w, 64, mp)
    spark.createDataFrame(
        [("hashed", None, 64, 0), ("hashed", None, 64, 0)],
        classifier._META_SCHEMA,
    ).write.mode("overwrite").parquet(mp + "/meta")
    with pytest.raises(ValueError, match="exactly one"):
        classifier.load_hashed_model(spark, mp)
    # hashed weights validated at load (ADVICE r12 — these previously
    # loaded cleanly and served silently wrong scores): out-of-range
    # bucket, duplicate bucket, missing bias row
    for bad_rows in (
        [(0, 0.1), (64, 0.2), (classifier.BIAS_BUCKET, -0.5)],  # >= n_buckets
        [(0, 0.1), (0, 0.2), (classifier.BIAS_BUCKET, -0.5)],  # duplicate
        [(0, 0.1), (1, 0.2)],  # no bias row
        [(0, None), (classifier.BIAS_BUCKET, -0.5)],  # null weight
    ):
        wp = str(tmp_path / "w")
        classifier.save_hashed_model(w, 64, wp)
        spark.createDataFrame(
            bad_rows, "bucket int, w double"
        ).write.mode("overwrite").parquet(wp + "/weights")
        with pytest.raises(ValueError, match="corrupt hashed model"):
            classifier.load_hashed_model(spark, wp)


def test_resolve_hashed_model_contract(spark, tmp_path):
    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=2)
    path = str(tmp_path / "rm")
    classifier.save_hashed_model(w, 64, path, seed=7)
    # path: artifact identity wins; explicit MATCHING n_buckets ok
    _, nb, seed = classifier.resolve_hashed_model(spark, path, None, 0)
    assert (nb, seed) == (64, 7)
    _, nb, _ = classifier.resolve_hashed_model(spark, path, 64, 0)
    assert nb == 64
    with pytest.raises(ValueError, match="authoritative"):
        classifier.resolve_hashed_model(spark, path, 128, 0)
    # a NON-default caller seed conflicting with the artifact's stored
    # seed is the same featurizer-identity mismatch (ADVICE r12); a
    # matching explicit seed is fine
    with pytest.raises(ValueError, match="seed"):
        classifier.resolve_hashed_model(spark, path, None, 3)
    _, _, seed = classifier.resolve_hashed_model(spark, path, None, 7)
    assert seed == 7
    # in-memory: n_buckets required
    with pytest.raises(ValueError, match="required"):
        classifier.resolve_hashed_model(spark, w, None, 0)


def test_curate_increment_accepts_model_path(spark, tmp_path):
    """The gate wired from a PATH drops the same docs as the in-memory
    table (build-once/serve-many parity for the batch delta shape)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import curation

    feats, labels = _sparse_frames(spark)
    w = classifier.train_logreg_hashed(feats, labels, n_iters=10, lr=2.0)
    path = str(tmp_path / "gate_model")
    classifier.save_hashed_model(w, 64, path, seed=0)
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in SPARSE_CORPUS], ["doc_id", "text"]
    )
    kw = dict(
        text_col="text", id_col="doc_id", neardup_threshold=None,
        classifier_min_score=0.5,
    )
    mem = curation.curate_increment(
        docs, str(tmp_path / "idx_mem"), classifier_model=w,
        classifier_n_buckets=64, **kw,
    )
    art = curation.curate_increment(
        docs, str(tmp_path / "idx_art"), classifier_model=path, **kw,
    )
    assert {r["doc_id"] for r in mem.collect()} == {r["doc_id"] for r in art.collect()}
