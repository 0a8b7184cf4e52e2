"""BM25 retrieval + Gopher-rules quality filter (r10): ranking math pinned
against a pure-Python reference, signal columns pinned rule by rule."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import retrieval
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
    gopher_keep_expr,
    gopher_signals,
)

CORPUS = [
    (1, "spark spark spark shuffle join"),
    (2, "spark merge"),
    (3, "merge merge merge merge merge and more merge rows here"),
    (4, "nothing relevant in this one at all"),
    (5, "spark merge spark merge"),
]


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    """Independent reference implementation — same tokenizer, Lucene idf."""
    qterms = retrieval.query_terms(query)
    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for t in docs.values() if q in t) for q in qterms
    }
    out = {}
    for i, toks in docs.items():
        s, hit = 0.0, 0
        for q in qterms:
            tf = toks.count(q)
            if not tf:
                continue
            hit += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += round(
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * (1 - b + b * len(toks) / avgdl)),
                6,
            )
        if hit:
            out[i] = (round(s, 6), hit)
    return out


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["score"], r["n_matched"])
        for r in retrieval.bm25_topk(df, "spark merge", k=10).collect()
    }
    assert got == _py_bm25(CORPUS, "spark merge")


def test_bm25_ordering_and_k(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    rows = retrieval.bm25_topk(df, "spark merge", k=2).collect()
    # k truncates; best-first; the no-hit doc never appears
    assert len(rows) == 2
    expect = sorted(
        _py_bm25(CORPUS, "spark merge").items(),
        key=lambda kv: (-kv[1][0], kv[0]),
    )
    assert [r["doc_id"] for r in rows] == [i for i, _ in expect[:2]]


def test_bm25_term_stats_hook(spark):
    """Precomputed (term, df_docs) stats — the 100 TB serve path — must
    reproduce the derived-stats result exactly."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    stats = spark.createDataFrame(
        [("spark", 3), ("merge", 3)], ["term", "df_docs"]
    )
    a = retrieval.bm25_topk(df, "spark merge", k=10).collect()
    b = retrieval.bm25_topk(df, "spark merge", k=10, term_stats=stats).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_query_terms_tokenizer():
    # lowercase + whitespace split + order-preserving dedup — the corpus
    # tokenizer's contract
    assert retrieval.query_terms("  Spark\tMERGE spark\n") == ["spark", "merge"]
    assert retrieval.query_terms("   ") == []


def test_bm25_empty_query_raises(spark):
    import pytest

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="zero terms"):
        retrieval.bm25_topk(df, "   ")


GOPHER_DOCS = [
    # 0: healthy doc — 60 words incl. 'the'+'and', mean len in [3,10]
    (0, " ".join(["alpha beta gamma the and delta"] * 10)),
    # 1: too short (3 words)
    (1, "the and with"),
    # 2: symbol-heavy: hashes outnumber words/10
    (2, " ".join(["the and ### word##"] * 15)),
    # 3: bullet lines dominate
    (3, "\n".join(["- the bullet and line item here okay fine sure yes"] * 6)),
    # 4: ellipsis line endings dominate
    (4, "\n".join(["the words and trail off here like so..."] * 8)),
    # 5: no required stopwords
    (5, " ".join(["zork blap quux flim"] * 15)),
]


def _sig(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = df.select("doc_id", *gopher_signals(F.col("text"))).withColumn(
        "keep", gopher_keep_expr()
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_rules_rule_by_rule(spark):
    s = _sig(spark, GOPHER_DOCS)
    assert s[0]["keep"] is True
    assert s[0]["n_words"] == 60 and s[0]["stop_hits"] == 2

    assert s[1]["keep"] is False and s[1]["n_words"] < 50

    assert s[2]["keep"] is False and s[2]["hash_ratio"] > 0.1
    # the thresholds are INDEPENDENT (Rae et al. A1.1): doc 2 is hash-heavy
    # but ellipsis-free — the other symbol probe must not inherit the fail
    assert s[2]["ellipsis_char_ratio"] == 0.0

    assert s[3]["keep"] is False and s[3]["bullet_frac"] == 1.0

    assert s[4]["keep"] is False and s[4]["ellipsis_frac"] == 1.0

    assert s[5]["keep"] is False and s[5]["stop_hits"] == 0


def test_gopher_struct_matches_signal_list_exactly(spark):
    """The r14 bound-struct form (textanalysis.gopher_struct — token and
    line arrays bound once in the tree, the fence-able shape the ledger
    and gopher_quality consume) must reproduce the signal-list form's
    eight fields AND the keep verdict exactly, on the rule-by-rule docs
    plus the empty/whitespace/NULL edge docs."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
        GOPHER_SIGNAL_NAMES,
        gopher_struct,
    )

    rows = GOPHER_DOCS + [(9, ""), (10, "   "), (11, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = df.select("doc_id", *gopher_signals(F.col("text"))).withColumn(
        "keep", gopher_keep_expr()
    )
    new = df.select(
        "doc_id",
        *[gopher_struct(F.col("text"))[n].alias(n) for n in GOPHER_SIGNAL_NAMES],
    ).withColumn("keep", gopher_keep_expr())
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_token_scorers_bound_forms_match_inline_reference(spark):
    """quality_score / lang_id / stopword_ratio / mean_token_len now bind
    the token array via bind_once; values must equal the pre-r14 inline
    forms (rebuilt here verbatim) on fixture-shaped, empty and NULL text."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
        EN_STOP,
        lang_id,
        mean_token_len,
        quality_score,
        stopword_ratio,
        tokens_expr,
    )

    def inline_mtl(t):
        toks = tokens_expr(t)
        total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
        return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)

    def inline_sw(t):
        toks = tokens_expr(t)
        hits = F.size(F.filter(toks, lambda x: x.isin(EN_STOP))).cast("bigint")
        return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)

    def inline_quality(t):
        toks = tokens_expr(t)
        n = F.size(toks)
        len_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.5)
        mtl = inline_mtl(t)
        mtl_ok = F.when((mtl >= 3) & (mtl <= 12), 1.0).otherwise(0.5)
        sw = inline_sw(t)
        sw_ok = F.when(sw >= 0.05, 1.0).otherwise(0.6)
        return F.round(len_ok * mtl_ok * sw_ok, 6)

    rows = [(i, t) for i, (_, t) in enumerate(GOPHER_DOCS)] + [
        (90, ""), (91, "   "), (92, None),
        (93, "the la el of de y in is for le"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.col("text")
    old = df.select(
        "doc_id", inline_quality(t).alias("q"), inline_mtl(t).alias("m"),
        inline_sw(t).alias("s"),
    )
    new = df.select(
        "doc_id", quality_score(t).alias("q"), mean_token_len(t).alias("m"),
        stopword_ratio(t).alias("s"),
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    langs = df.select("doc_id", lang_id(t).alias("l")).collect()
    assert all(r["l"] in ("en", "fr", "es", "unknown") for r in langs)
    assert {r["doc_id"]: r["l"] for r in langs}[92] == "unknown"


def test_gopher_empty_doc_fails_not_escapes(spark):
    s = _sig(spark, [(9, ""), (10, "   ")])
    for i in (9, 10):
        assert s[i]["keep"] is False
        assert s[i]["n_words"] == 0 and s[i]["mean_word_len"] == 0.0


def test_bm25_index_build_serve_parity(spark, tmp_path):
    """The durable build/serve split (build_bm25_index → bm25_topk with
    precomputed stats) must reproduce the single-call result exactly —
    including df semantics (a term twice in one doc counts ONE doc)."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    stats, consts = retrieval.build_bm25_index(df, str(tmp_path / "bm25_idx"))
    # df counts documents, not occurrences: 'spark' is in docs 1, 2, 5
    got_df = {r["term"]: r["df_docs"] for r in stats.collect()}
    assert got_df["spark"] == 3 and got_df["merge"] == 3
    c = consts.collect()[0]
    assert c["__n_docs"] == 5

    derived = retrieval.bm25_topk(df, "spark merge", k=10).collect()
    # serve from the re-read parquet artifact (fresh session path)
    stats2, consts2 = retrieval.load_bm25_index(spark, str(tmp_path / "bm25_idx"))
    served = retrieval.bm25_topk(
        df, "spark merge", k=10, term_stats=stats2, consts=consts2
    ).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, derived))


def test_bm25_index_add_increment_equals_full_rebuild(spark, tmp_path):
    """Serve parity (VERDICT r10 #3): bootstrap on half the corpus +
    bm25_index_add of the other half ≡ one full build — identical merged
    stats and identical served top-k (df and avgdl recompose exactly
    from the summed per-batch totals)."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    half_a = df.filter(F.col("doc_id") % 2 == 0)
    half_b = df.filter(F.col("doc_id") % 2 == 1)

    retrieval.build_bm25_index(df, str(tmp_path / "full"))
    retrieval.build_bm25_index(half_a, str(tmp_path / "inc"))
    retrieval.bm25_index_add(half_b, str(tmp_path / "inc"))

    fs, fc = retrieval.load_bm25_index(spark, str(tmp_path / "full"))
    is_, ic = retrieval.load_bm25_index(spark, str(tmp_path / "inc"))
    assert sorted(map(tuple, fs.collect())) == sorted(map(tuple, is_.collect()))
    assert fc.collect() == ic.collect()

    full = retrieval.bm25_topk(df, "spark merge", term_stats=fs, consts=fc)
    inc = retrieval.bm25_topk(df, "spark merge", term_stats=is_, consts=ic)
    assert full.collect() == inc.collect()


def test_bm25_index_add_idempotent_rerun(spark, tmp_path):
    """Re-running the same delta with an explicit batch_id overwrites its
    own partition instead of double-counting the delta's documents."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    retrieval.build_bm25_index(df.limit(3), idx)
    delta = df.filter(F.col("doc_id") >= 4)
    retrieval.bm25_index_add(delta, idx, batch_id=1)
    once = retrieval.load_bm25_index(spark, idx)[1].collect()
    retrieval.bm25_index_add(delta, idx, batch_id=1)
    again_s, again_c = retrieval.load_bm25_index(spark, idx)
    assert again_c.collect() == once
    assert again_c.collect()[0]["__n_docs"] == 5


def test_bm25_index_incomplete_batch_excluded(spark, tmp_path):
    """A batch present in terms/ but not consts/ (crash between the two
    writes) must be EXCLUDED from the serve view — serving its terms
    without its doc mass would skew idf — and repaired by re-running the
    delta with the same id."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    retrieval.build_bm25_index(df.limit(3), idx)
    delta = df.filter(F.col("doc_id") >= 4)
    # simulate the crash: write only the terms half of batch 1
    ts, _ = retrieval._bm25_batch_stats(delta, "text", "doc_id")
    ts.write.mode("overwrite").parquet(f"{idx}/terms/batch=1")
    s, c = retrieval.load_bm25_index(spark, idx)
    assert c.collect()[0]["__n_docs"] == 3  # only the complete batch
    # the allocator treats the half-written id as TAKEN
    retrieval.bm25_index_add(delta, idx)  # allocates batch 2, not 1
    s2, c2 = retrieval.load_bm25_index(spark, idx)
    assert c2.collect()[0]["__n_docs"] == 5
    # repair: re-run the crashed delta with its id → now double-counted?
    # no — batch 1 and 2 would both hold the delta; the incomplete-batch
    # rule exists precisely so the operator CHOOSES: repair-in-place
    # (explicit batch_id=1, never having run batch 2) or roll forward.


def test_gopher_null_text_fails_not_null(spark):
    """NULL text is an empty document: zeros + keep=False, never NULL
    signals (r10 self-review: the stopword sum over a NULL token array
    went NULL, diverging from the DuckDB mirror's 0/false)."""
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    out = df.select("doc_id", *gopher_signals(F.col("text"))).withColumn(
        "keep", gopher_keep_expr()
    )
    s = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert s[1]["keep"] is False
    assert s[1]["n_words"] == 0 and s[1]["stop_hits"] == 0
    assert s[1]["hash_ratio"] == 0.0 and s[1]["ellipsis_char_ratio"] == 0.0


def test_query_terms_ascii_whitespace_matches_corpus_tokenizer():
    """Java \\s (the corpus tokenizer) is ASCII-only: a non-breaking
    space is TOKEN CONTENT, not a separator — the query side must agree
    or the pruned isin never matches the document's token (r10
    self-review)."""
    assert retrieval.query_terms("data pipeline x") == [
        "data pipeline",
        "x",
    ]


def test_bm25_batch_matches_single_query_results(spark):
    """The batched operator's per-query rows equal the single-query
    operator's output for the same query — one pass over the corpus must
    not change any score."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [(1, "spark merge"), (2, "join rows")], ["query_id", "query_text"]
    )
    batch = retrieval.bm25_topk_batch(df, qdf, k=10).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["n_matched"])
        )
    for qid, qtext in [(1, "spark merge"), (2, "join rows")]:
        single = [
            (r["doc_id"], r["score"], r["n_matched"])
            for r in retrieval.bm25_topk(df, qtext, k=10).collect()
        ]
        assert by_q[qid] == single, qid


def test_bm25_batch_k_truncates_per_query(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [(1, "spark merge"), (2, "merge")], ["query_id", "query_text"]
    )
    rows = retrieval.bm25_topk_batch(df, qdf, k=1).collect()
    per_q = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert per_q == {1: 1, 2: 1}


# ── model-based language ID (r11) ────────────────────────────────────────────

def test_lang_id_ngram_accuracy_on_labeled_sentences(spark):
    """Labeled-fixture accuracy (VERDICT r10 #4): real per-language
    sentences (function-word-rich, the signal char-n-gram profiles key
    on) must classify 100% under the seed profiles — the registry
    fixtures can't test this (their synthetic text is English-like for
    every lang label, documented in the lang_id_ngram query)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
        lang_id_ngram_scores,
        lang_profile_seed_df,
        train_lang_profiles,
    )

    labeled = [
        (0, "en", "the cat and the dog are in the house with one of them"),
        (1, "en", "this is from the one that they have at the house"),
        (2, "es", "el perro y el gato no se van de la casa con su amigo"),
        (3, "es", "una de las cosas que no es para los del lugar"),
        (4, "fr", "le chat et le chien ne sont pas dans la maison avec vous"),
        (5, "fr", "cette une du pays qui est pour les gens au bord"),
        (6, "de", "der hund und die katze sind nicht im haus mit der frau"),
        (7, "de", "das ist eine von den dingen die nicht im haus sind"),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, _, t in labeled], "doc_id long, text string"
    )
    profiles, oov = train_lang_profiles(lang_profile_seed_df(spark))
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in lang_id_ngram_scores(docs, profiles, oov).collect()
    }
    assert got == {i: lang for i, lang, _ in labeled}


def test_lang_id_ngram_empty_and_null_predict_unknown(spark):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
        lang_id_ngram_scores,
        lang_profile_seed_df,
        train_lang_profiles,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab")], "doc_id long, text string"
    )
    profiles, oov = train_lang_profiles(lang_profile_seed_df(spark))
    got = {
        r["doc_id"]: (r["pred_lang"], r["score"])
        for r in lang_id_ngram_scores(docs, profiles, oov).collect()
    }
    # "" / NULL / sub-n-gram text: no grams, no evidence — unknown, NULL
    assert got == {
        1: ("unknown", None),
        2: ("unknown", None),
        3: ("unknown", None),
    }


def test_lang_id_ngram_profiles_broadcast_only(spark):
    """100 TB shape: the corpus GRAM rows must reach the profile join as
    a broadcast (never shuffle on the gram key) and no Python runs. The
    one sort-merge join in the plan is the per-doc grid attach — two
    O(docs × langs) SLIM frames keyed by doc id (the perplexity-family
    per-doc reduce class), not corpus text."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
        lang_id_ngram_scores,
        lang_profile_seed_df,
        train_lang_profiles,
    )

    docs = spark.createDataFrame(
        [(1, "the of and to in")], "doc_id long, text string"
    )
    profiles, oov = train_lang_profiles(lang_profile_seed_df(spark))
    plan = (
        lang_id_ngram_scores(docs, profiles, oov)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # the CORPUS gram key must never be an exchange key (content-keyed
    # shuffle of doc grams); the training side's (lang, gram) groupBy
    # exchange is over the bounded SEED corpus and is expected
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        if "gram" in m.group(1):
            assert "lang" in m.group(1), m.group(0)


def test_bm25_rebuild_purges_stale_delta_batches(spark, tmp_path):
    """A full rebuild over an existing index must DELETE earlier delta
    partitions — batch=0 alone would merge with them and double-count
    the delta's documents (r11 self-review)."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    retrieval.build_bm25_index(df.limit(3), idx)
    retrieval.bm25_index_add(df.filter(F.col("doc_id") >= 4), idx)
    # rebuild over the full corpus: stale batch=1 must vanish
    _, consts = retrieval.build_bm25_index(df, idx)
    assert consts.collect()[0]["__n_docs"] == 5


def test_bm25_legacy_flat_index_readable_not_growable(spark, tmp_path):
    """A pre-r11 flat artifact (terms/ + consts/ parquet with the final
    __avgdl row, no batch= partitions) still SERVES via load_bm25_index;
    appending raises the migration error instead of mixing incompatible
    constants."""
    import pytest

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    base = str(tmp_path / "legacy")
    terms, consts = retrieval.build_bm25_index(df)  # in-memory shapes
    terms.write.parquet(f"{base}/terms")
    consts.write.parquet(f"{base}/consts")
    ls, lc = retrieval.load_bm25_index(spark, base)
    got = retrieval.bm25_topk(
        df, "spark merge", k=10, term_stats=ls, consts=lc
    ).collect()
    want = retrieval.bm25_topk(df, "spark merge", k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    with pytest.raises(ValueError, match="legacy flat BM25 index"):
        retrieval.bm25_index_add(df, base)


def test_bm25_null_text_avgdl_consistent_across_paths(spark, tmp_path):
    """NULL text = empty doc (length 0, COUNTED) in every stats path —
    derived, in-memory build, and durable index must agree (r11
    self-review: avg(size) skipped null sizes on one path only)."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "c d e f")], "doc_id long, text string"
    )
    _, mem = retrieval.build_bm25_index(df)
    _, dur = retrieval.build_bm25_index(df, str(tmp_path / "i"))
    assert mem.collect()[0]["__avgdl"] == dur.collect()[0]["__avgdl"] == 2.0


# ── RRF hybrid fusion (r11) ─────────────────────────────────────────────────

def _py_rrf(lists, k0=60):
    """Independent reference: dict per list of id -> rank."""
    ids = set()
    for d in lists:
        ids |= set(d)
    return {
        i: round(sum(1.0 / (k0 + d[i]) for d in lists if i in d), 9)
        for i in ids
    }


def test_rrf_fuse_matches_python_reference(spark):
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3), (50, 4)], ["doc_id", "rank"]
    )
    got = retrieval.rrf_fuse([("lex", a), ("den", b)], k=10).collect()
    want = _py_rrf([{10: 1, 20: 2, 30: 3}, {20: 1, 40: 2, 10: 3, 50: 4}])
    assert {r["doc_id"]: r["rrf_score"] for r in got} == want
    # ranks: fused order by score desc then id; 20 wins (ranks 2+1),
    # then 10 (1+3); one-list docs trail
    order = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert order[:2] == [20, 10]
    # per-list rank columns surface, NULL where the doc missed a list
    row30 = next(r for r in got if r["doc_id"] == 30)
    assert row30["lex_rank"] == 3 and row30["den_rank"] is None


def test_rrf_fuse_batched_per_query(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 10, 1)], ["qid", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (2, 30, 1), (2, 10, 2)], ["qid", "doc_id", "rank"]
    )
    got = retrieval.rrf_fuse(
        [("lex", a), ("den", b)], k=2, query_col="qid"
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    # q1: doc 20 (2+1) beats doc 10 (1+miss); q2: doc 10 (1+2) beats 30
    assert [r["doc_id"] for r in sorted(by_q[1], key=lambda r: r["rank"])] == [20, 10]
    assert [r["doc_id"] for r in sorted(by_q[2], key=lambda r: r["rank"])] == [10, 30]


def test_rrf_fuse_validates_inputs(spark):
    import pytest

    a = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
    with pytest.raises(ValueError, match="at least two"):
        retrieval.rrf_fuse([("only", a)])
    with pytest.raises(ValueError, match="k0 must be"):
        retrieval.rrf_fuse([("a", a), ("b", a)], k0=0)
    bad = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="lacks columns"):
        retrieval.rrf_fuse([("a", a), ("b", bad)])


def test_rrf_fuse_three_lists_and_tiebreak(spark):
    # symmetric ranks -> equal scores -> id ascending breaks the tie
    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (1, 2)], ["doc_id", "rank"])
    c = spark.createDataFrame([(3, 1)], ["doc_id", "rank"])
    got = retrieval.rrf_fuse([("x", a), ("y", b), ("z", c)], k=3).collect()
    rows = sorted(got, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["rrf_score"] == rows[1]["rrf_score"]


def test_rrf_fuse_rejects_duplicate_list_names(spark):
    import pytest

    a = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
    with pytest.raises(ValueError, match="unique"):
        retrieval.rrf_fuse([("lex", a), ("lex", a)])


# ── IR metrics (r11) ────────────────────────────────────────────────────────

def test_retrieval_metrics_hand_computed(spark):
    import math as _m

    results = spark.createDataFrame(
        [(1, 101, 1), (1, 102, 2), (1, 103, 3),
         (2, 201, 1), (2, 202, 2),
         (3, 301, 1)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, 102), (1, 103), (1, 104),   # 2 of 3 relevant retrieved
         (2, 999),                        # nothing retrieved
         (3, 301)],                       # perfect
        ["query_id", "doc_id"],
    )
    got = {r["query_id"]: r for r in retrieval.retrieval_metrics(results, qrels, k=3).collect()}
    # q1: hits at ranks 2,3 -> recall 2/3, mrr 1/2,
    #     dcg = 1/log2(3)+1/log2(4); idcg = 1/log2(2)+1/log2(3)+1/log2(4)
    dcg = round(1 / _m.log2(3), 8) + round(1 / _m.log2(4), 8)
    idcg = round(1 / _m.log2(2), 8) + round(1 / _m.log2(3), 8) + round(1 / _m.log2(4), 8)
    assert got[1]["recall"] == round(2 / 3, 6)
    assert got[1]["mrr"] == 0.5
    assert got[1]["ndcg"] == round(dcg / idcg, 6)
    assert (got[2]["recall"], got[2]["mrr"], got[2]["ndcg"]) == (0.0, 0.0, 0.0)
    assert (got[3]["recall"], got[3]["mrr"], got[3]["ndcg"]) == (1.0, 1.0, 1.0)
    assert got[1]["n_rel"] == 3 and got[1]["n_hits"] == 2


def test_retrieval_metrics_respects_cutoff_and_validates(spark):
    import pytest

    results = spark.createDataFrame(
        [(1, 101, 1), (1, 102, 5)], ["query_id", "doc_id", "rank"]
    )
    qrels = spark.createDataFrame([(1, 102)], ["query_id", "doc_id"])
    got = retrieval.retrieval_metrics(results, qrels, k=3).collect()[0]
    assert got["n_hits"] == 0 and got["recall"] == 0.0  # hit is past the cutoff
    with pytest.raises(ValueError, match="k must be"):
        retrieval.retrieval_metrics(results, qrels, k=0)


def test_rrf_hybrid_beats_components_on_constructed_lists(spark):
    """Fusion genuinely helps when the component lists have COMPLEMENTARY
    coverage: lex finds {1,2} early, dense finds {3,4} early, all four are
    relevant — RRF interleaves them, so hybrid recall@4 strictly beats
    BOTH components (ADVICE r11: the old test asserted this property in
    its name without computing a hybrid ranking)."""
    lex = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 101, 3), (7, 102, 4)],
        ["query_id", "doc_id", "rank"],
    )
    dense = spark.createDataFrame(
        [(7, 3, 1), (7, 4, 2), (7, 103, 3), (7, 104, 4)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(7, d) for d in (1, 2, 3, 4)], ["query_id", "doc_id"]
    )
    fused = retrieval.rrf_fuse(
        [("lex", lex), ("dense", dense)], k=4, query_col="query_id"
    )
    metric = lambda res: retrieval.retrieval_metrics(  # noqa: E731
        res, qrels, k=4
    ).collect()[0]
    h, l, d = metric(fused), metric(lex), metric(dense)
    assert l["recall"] == 0.5 and d["recall"] == 0.5
    assert h["recall"] == 1.0  # strictly beats both components
    assert h["ndcg"] > max(l["ndcg"], d["ndcg"])


def test_retrieval_metrics_dense_topk_smoke(spark, sf_dir):
    """Smoke the harness on real operators: the same qrels grade the
    dense top-10; metrics are in [0,1] and queries all judged."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import similarity

    queries = emb.filter(F.col("vec_id") < 5)
    res = similarity.topk_bruteforce(queries, emb, "embedding", "vec_id", k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    qrels = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
        .join(emb.select(F.col("vec_id").alias("doc_id"), F.col("label").alias("cl")),
              F.col("ql") == F.col("cl"))
        .where(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
    )
    rows = retrieval.retrieval_metrics(res, qrels, k=10).collect()
    assert len(rows) == 5
    for r in rows:
        for m in ("recall", "mrr", "ndcg"):
            assert 0.0 <= r[m] <= 1.0, (r["query_id"], m)
