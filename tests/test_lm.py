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
