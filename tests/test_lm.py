"""Unigram-LM perplexity scoring (r10): model math pinned against a pure
Python reference, OOV class and empty-doc semantics pinned explicitly."""

from __future__ import annotations

import math

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import lm

CORPUS = [
    (1, "a a a b b c"),
    (2, "a b c d"),
    (3, "a a zz"),
]


def _py_model(corpus, vocab_size=None, alpha=0.5):
    counts: dict[str, int] = {}
    for _, t in corpus:
        for tok in t.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
    total = sum(counts.values())
    kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    if vocab_size is not None:
        kept = kept[:vocab_size]
    v = len(kept)
    denom = total + alpha * (v + 1.0)
    logp = {t: round(math.log((c + alpha) / denom), 8) for t, c in kept}
    oov = round(math.log(alpha / denom), 8)
    return logp, oov


def _py_scores(corpus, model, oov):
    out = {}
    for i, t in corpus:
        toks = t.lower().split()
        if not toks:
            out[i] = (0, None, None)
            continue
        s = sum(model.get(tok, oov) for tok in toks)
        ce = -s / len(toks)
        out[i] = (len(toks), round(ce, 6), round(math.exp(ce), 6))
    return out


def test_perplexity_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in lm.perplexity_score(df).collect()
    }
    model, oov = _py_model(CORPUS)
    assert got == _py_scores(CORPUS, model, oov)


def test_perplexity_vocab_cap_routes_tail_to_oov(spark):
    """vocab_size=2 keeps {a, b}; c/d/zz must score through the OOV
    class — and the OOV log-prob is strictly worse than any kept term."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    model, oov = _py_model(CORPUS, vocab_size=2)
    assert set(model) == {"a", "b"}
    assert all(oov < lp for lp in model.values())
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in lm.perplexity_score(df, vocab_size=2).collect()
    }
    assert got == _py_scores(CORPUS, model, oov)


def test_perplexity_empty_doc_null_not_zero(spark):
    df = spark.createDataFrame(
        CORPUS + [(9, ""), (10, "   ")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in lm.perplexity_score(df).collect()}
    for i in (9, 10):
        assert got[i]["n_tokens"] == 0
        assert got[i]["cross_entropy"] is None
        assert got[i]["perplexity"] is None
    # non-empty docs still scored under the (unchanged-tokens) model
    assert got[1]["n_tokens"] == 6


def test_perplexity_reference_corpus_hook(spark):
    """The CCNet setup: train on corpus A, score corpus B — in-domain
    text must score lower cross-entropy than OOV-heavy text."""
    train = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    stats = lm.unigram_lm_stats(train)
    target = spark.createDataFrame(
        [(100, "a a b"), (101, "qq rr ss")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm.perplexity_score(target, lm_stats=stats).collect()
    }
    assert got[100] < got[101]
    model, oov = _py_model(CORPUS)
    exp = _py_scores([(100, "a a b"), (101, "qq rr ss")], model, oov)
    assert got[100] == exp[100][1] and got[101] == exp[101][1]


# ── stupid-backoff bigram (r10) ─────────────────────────────────────────────

def _py_bigram_model(corpus, vocab_size=None, bigram_size=None, alpha=0.5):
    uni, oov = _py_model(corpus, vocab_size, alpha)
    bigc: dict[tuple[str, str], int] = {}
    prevc: dict[str, int] = {}
    for _, t in corpus:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            bigc[(a, b)] = bigc.get((a, b), 0) + 1
            prevc[a] = prevc.get(a, 0) + 1
    scored = sorted(
        ((p, tm, c) for (p, tm), c in bigc.items()),
        key=lambda x: (-x[2], x[0], x[1]),
    )
    if bigram_size is not None:
        scored = scored[:bigram_size]
    logs = {
        (p, tm): round(math.log(c / prevc[p]), 8) for p, tm, c in scored
    }
    return logs, uni, oov


def _py_bigram_scores(corpus, logs, uni, oov):
    lb = math.log(lm.BACKOFF)
    out = {}
    for i, t in corpus:
        toks = t.lower().split()
        if not toks:
            out[i] = (0, None, None)
            continue
        s = 0.0
        prev = None
        for tok in toks:
            if prev is not None and (prev, tok) in logs:
                s += logs[(prev, tok)]
            else:
                s += round(lb + uni.get(tok, oov), 8)
            prev = tok
        ce = -s / len(toks)
        out[i] = (len(toks), round(ce, 6), round(math.exp(ce), 6))
    return out


def test_bigram_perplexity_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in lm.perplexity_score_bigram(df).collect()
    }
    logs, uni, oov = _py_bigram_model(CORPUS)
    assert got == _py_bigram_scores(CORPUS, logs, uni, oov)


def test_bigram_cap_routes_tail_to_backoff(spark):
    """bigram_size=2 keeps only the two most frequent bigrams; every
    other position (incl. all first tokens) must take the backoff arm."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    logs, uni, oov = _py_bigram_model(CORPUS, bigram_size=2)
    assert len(logs) == 2
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in lm.perplexity_score_bigram(df, bigram_size=2).collect()
    }
    assert got == _py_bigram_scores(CORPUS, logs, uni, oov)


def test_bigram_single_token_and_empty_docs(spark):
    """A 1-token doc has no bigram at all — pure backoff; empty stays
    NULL."""
    rows = CORPUS + [(20, "a"), (21, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm.perplexity_score_bigram(df).collect()}
    logs, uni, oov = _py_bigram_model(rows)
    exp = _py_bigram_scores(rows, logs, uni, oov)
    assert got[20]["n_tokens"] == 1
    assert got[20]["cross_entropy"] == exp[20][1]
    assert got[21]["n_tokens"] == 0 and got[21]["cross_entropy"] is None


# ── expression scoring path (the streaming gate) ───────────────────────────

def test_ce_expr_agrees_with_bulk_path(spark):
    """The literal-map fold (streaming gate) and the broadcast-join bulk
    path score within float-fold precision of each other — they differ
    only in double-vs-decimal summation order."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    stats = lm.unigram_lm_stats(df, vocab_size=3)
    m, oov = lm.collect_lm_expr_model(*stats)
    expr_ce = {
        r["doc_id"]: r["ce"]
        for r in df.select(
            "doc_id",
            lm.perplexity_ce_expr(F.col("text"), m, oov).alias("ce"),
        ).collect()
    }
    bulk_ce = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm.perplexity_score(df, lm_stats=stats).collect()
    }
    for i in bulk_ce:
        assert abs(expr_ce[i] - bulk_ce[i]) < 2e-6, i


def test_collect_lm_expr_model_bounded(spark):
    import pytest

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    stats = lm.unigram_lm_stats(df)  # uncapped: 5 terms
    with pytest.raises(ValueError, match="max_vocab"):
        lm.collect_lm_expr_model(*stats, max_vocab=3)
    m, oov = lm.collect_lm_expr_model(*stats, max_vocab=10)
    assert set(m) == {"a", "b", "c", "d", "zz"} and oov < 0


def test_perplexity_null_text_is_empty_not_vanished(spark):
    """NULL text scores as an empty document (0 tokens, NULL scores) —
    size(NULL) is NULL under non-legacy semantics and must not make the
    row vanish from the union-of-empties plan (r10 plan-audit rewrite)."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, None)], "doc_id long, text string"
    )
    for fn in (lm.perplexity_score, lm.perplexity_score_bigram):
        got = {r["doc_id"]: r for r in fn(df).collect()}
        assert set(got) == {1, 2}, fn.__name__
        assert got[2]["n_tokens"] == 0 and got[2]["cross_entropy"] is None


def test_collect_lm_expr_model_degenerate_corpus_raises(spark):
    """An empty/all-blank reference corpus trains a degenerate model —
    the collect step must fail with the cause, not float(None) later
    (r10 self-review)."""
    import pytest

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm.collect_lm_expr_model(*lm.unigram_lm_stats(empty))
    blank = spark.createDataFrame([(1, "   "), (2, None)], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm.collect_lm_expr_model(*lm.unigram_lm_stats(blank))


# ── durable LM artifact (r12) ───────────────────────────────────────────────

def test_lm_artifact_roundtrip_and_gate_parity(spark, tmp_path):
    """save_lm → load_lm serves the SAME model: the collected expression
    model (gate form) and bulk scores from the loaded artifact equal the
    trained ones exactly (parquet doubles roundtrip)."""
    import pytest
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    freqs, consts = lm.unigram_lm_stats(docs, vocab_size=4)
    path = str(tmp_path / "lm_model")
    lm.save_lm(freqs, consts, path)
    f2, c2 = lm.load_lm(spark, path)
    m1, o1 = lm.collect_lm_expr_model(freqs, consts)
    m2, o2 = lm.collect_lm_expr_model(f2, c2)
    assert (m1, o1) == (m2, o2)
    # resolve_lm: path and tuple are interchangeable in gate wiring
    f3, c3 = lm.resolve_lm(spark, path)
    assert lm.collect_lm_expr_model(f3, c3) == (m1, o1)
    assert lm.resolve_lm(spark, (freqs, consts)) == (freqs, consts)
    # corrupt: two consts rows
    bad = str(tmp_path / "lm_bad")
    lm.save_lm(freqs, consts, bad)
    consts.union(consts).write.mode("overwrite").parquet(bad + "/consts")
    with pytest.raises(ValueError, match="exactly one"):
        lm.load_lm(spark, bad)


def test_curate_increment_accepts_lm_path(spark, tmp_path):
    """The perplexity gate wired from a save_lm PATH drops the same docs
    as the in-memory (freqs, consts) pair."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import curation

    ref = spark.createDataFrame(CORPUS, "doc_id long, text string")
    stats = lm.unigram_lm_stats(ref, vocab_size=8)
    path = str(tmp_path / "gate_lm")
    lm.save_lm(*stats, path)
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "qq ww ee rr tt yy")], "doc_id long, text string"
    )
    kw = dict(neardup_threshold=None, perplexity_max_ce=2.5)
    mem = curation.curate_increment(
        docs, str(tmp_path / "ci_mem"), perplexity_lm=stats, **kw
    )
    art = curation.curate_increment(
        docs, str(tmp_path / "ci_art"), perplexity_lm=path, **kw
    )
    assert (
        {r["doc_id"] for r in mem.collect()}
        == {r["doc_id"] for r in art.collect()}
    )
