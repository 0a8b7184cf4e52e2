"""Distributed BPE (r11): the merge sequence is pinned EXACTLY against a
pure-Python Sennrich et al. 2016 reference trainer; encoding is pinned
against the reference greedy lowest-rank loop plus a lossless-roundtrip
invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import bpe

END = bpe.END

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "new new lower"),
]


def _py_word_freqs(corpus):
    freqs: dict[str, int] = {}
    for _, text in corpus:
        for w in text.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _py_merge_word(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _py_train(freqs, n_merges, min_count=2):
    state = {w: list(w) + [END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((left, right, cnt))
        state = {w: _py_merge_word(s, left, right) for w, s in state.items()}
    return merges


def test_trainer_matches_sennrich_reference_on_toy(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = bpe.train_bpe(docs, n_merges=12)  # driver-capped fast path
    want = _py_train(_py_word_freqs(CORPUS), 12)
    assert got == want
    # the DISTRIBUTED loop computes the identical sequence
    dist = bpe.train_bpe(docs, n_merges=12, max_driver_words=None)
    assert dist == want
    # sanity on content: 'newest' dominates, so (e,s)/(es,t)-style merges
    # appear early and every merge count is >= min_count
    assert all(c >= 2 for _, _, c in got)


def test_trainer_matches_reference_on_fixture_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = bpe.train_bpe(docs, n_merges=15)
    rows = docs.select(F.col("text")).collect()
    want = _py_train(_py_word_freqs([(0, r["text"] or "") for r in rows]), 15)
    assert got == want
    # distributed mode agrees on the real corpus too (fewer merges to
    # bound the per-iteration job overhead this pins)
    assert bpe.train_bpe(docs, n_merges=6, max_driver_words=None) == want[:6]


def test_trainer_partition_layout_independent(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    a = bpe.train_bpe(docs, n_merges=8, max_driver_words=None)
    b = bpe.train_bpe(docs.repartition(7), n_merges=8, max_driver_words=None)
    assert a == b


def test_trainer_early_stop_on_min_count(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=500, min_count=4)
    assert 0 < len(merges) < 500
    assert all(c >= 4 for _, _, c in merges)


def test_trainer_validates(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_merges"):
        bpe.train_bpe(docs, n_merges=0)


def test_encode_matches_reference_greedy(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=10)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe.encode_bpe(docs, merges).collect()}
    for doc_id, text in CORPUS:
        want = []
        for w in text.lower().split():
            want.extend(bpe._encode_word(w, ranks))
        assert got[doc_id] == want, doc_id


def test_encode_roundtrip_lossless(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = bpe.train_bpe(docs, n_merges=10)
    joined = bpe.encode_bpe(docs, merges).join(docs.select("doc_id", "text"), "doc_id")
    bad = joined.filter(
        F.concat_ws("", "bpe_tokens")
        != F.concat_ws(
            "",
            F.transform(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""),
                lambda w: F.concat(w, F.lit(END)),
            ),
        )
    ).count()
    assert bad == 0


def test_encode_with_no_merges_is_chars(spark):
    docs = spark.createDataFrame([(1, "ab c")], ["doc_id", "text"])
    got = bpe.encode_bpe(docs, []).collect()[0]["bpe_tokens"]
    assert got == ["a", "b", END, "c", END]


def test_merge_table_shape(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=5)
    t = bpe.merge_table(spark, merges)
    rows = t.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(len(merges)))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_encode_null_text_is_empty_doc(spark):
    """NULL text = empty doc (the corpus-wide convention): encodes to an
    empty token array instead of crashing the Arrow task."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe.encode_bpe(docs, []).collect()}
    assert got[1] == ["a", "b", END]
    assert got[2] == []


def test_encode_non_bigint_id_column(spark):
    docs = spark.createDataFrame([("u1", "ab")], "url string, text string")
    got = bpe.encode_bpe(docs, [], id_col="url").collect()
    assert got[0]["url"] == "u1" and got[0]["bpe_tokens"] == ["a", "b", END]


def test_save_load_roundtrip_and_serve_parity(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=8)
    path = str(tmp_path / "vocab")
    bpe.save_bpe(spark, merges, path)
    loaded = bpe.load_bpe(spark, path)
    assert loaded == merges
    a = {r["doc_id"]: r["bpe_tokens"] for r in bpe.encode_bpe(docs, merges).collect()}
    b = {r["doc_id"]: r["bpe_tokens"] for r in bpe.encode_bpe(docs, loaded).collect()}
    assert a == b


def test_load_rejects_corrupt_artifact(spark, tmp_path):
    path = str(tmp_path / "bad")
    t = bpe.merge_table(spark, [("a", "b", 5), ("b", "c", 4)])
    t.where(F.col("rank") == 1).write.parquet(path)  # rank 0 missing
    with pytest.raises(ValueError, match="contiguous"):
        bpe.load_bpe(spark, path)
