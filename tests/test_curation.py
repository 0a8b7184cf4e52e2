"""Unit evidence for the corpus-curation trio (operators/curation.py) on
crafted inputs — the oracle rows prove fixture-scale parity; these pin the
operator semantics on known values and adversarial edges."""

from __future__ import annotations

import pytest

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import curation


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# ── PII redaction ──────────────────────────────────────────────────────────

@pytest.mark.parametrize(
    "text, redacted, n_email, n_phone, n_ip",
    [
        ("mail bob.smith+x@sub.example.co now", "mail <EMAIL> now", 1, 0, 0),
        ("call +966555012345 thanks", "call <PHONE> thanks", 0, 1, 0),
        ("host 192.168.0.1 down", "host <IP> down", 0, 0, 1),
        ("no pii here", "no pii here", 0, 0, 0),
        # all three, plus a second email
        (
            "a@b.io and c@d.org via 10.0.0.7 or +123456789",
            "<EMAIL> and <EMAIL> via <IP> or <PHONE>",
            2, 1, 1,
        ),
        # 16-digit run after '+': greedy match takes the 15-digit E.164 max,
        # one digit remains (documented leftmost-greedy contract)
        ("+1234567890123456", "<PHONE>6", 0, 1, 0),
        # dotted quad glued into a longer dotted run: \b anchors still fire
        ("1.2.3.4.5", "<IP>.5", 0, 0, 1),
    ],
)
def test_redact_pii_known_values(spark, text, redacted, n_email, n_phone, n_ip):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(curation.redact_pii(df, "text", "doc_id"))
    assert r["redacted"] == redacted
    assert (r["n_email"], r["n_phone"], r["n_ip"]) == (n_email, n_phone, n_ip)


def test_redact_counts_are_on_original_text(spark):
    """Counts are per-pattern on the RAW text even though redaction is
    sequential — an email's digits never leak into the phone count."""
    df = spark.createDataFrame(
        [(1, "user123456789@example.com")], "doc_id long, text string"
    )
    r = _one(curation.redact_pii(df, "text", "doc_id"))
    assert r["redacted"] == "<EMAIL>"
    assert (r["n_email"], r["n_phone"], r["n_ip"]) == (1, 0, 0)


def test_redact_pii_cross_engine_parity_adversarial(spark):
    """Property-style Java-regex vs RE2 parity on adversarial strings.

    The PII patterns are written in the dialect-common subset, but that
    claim needs teeth beyond the fixture corpus (which the oracle gate
    covers): generate strings dense in the boundary characters the
    patterns care about (@ . + digits, \\b edges, glued matches) and pin
    Spark's redaction + counts to DuckDB's byte-for-byte. Deterministic
    seed — a failure reproduces."""
    import random

    import duckdb

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.curation import (
        PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE,
    )

    rng = random.Random(20260814)
    frags = [
        "a@b.co", "x.y@z.example.org", "@@", "@.", "a@b", "a@b.c",  # email-ish
        "+123456789", "+12345678", "+123456789012345678", "plus+99",  # phone-ish
        "1.2.3.4", "10.0.0.255", "999.999.999.999", "1.2.3", "1.2.3.4.5",
        "v1.2.3.4x", "..", "word", "  ", "7", "end.",
    ]
    texts = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["redacted"], r["n_email"], r["n_phone"], r["n_ip"])
        for r in curation.redact_pii(df, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        red, ne, np_, ni = con.execute(
            """SELECT regexp_replace(regexp_replace(regexp_replace(?,
                 ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<IP>', 'g'),
               len(regexp_extract_all(?, ?)),
               len(regexp_extract_all(?, ?)),
               len(regexp_extract_all(?, ?))""",
            [t, PII_EMAIL_RE, PII_PHONE_RE, PII_IPV4_RE,
             t, PII_EMAIL_RE, t, PII_PHONE_RE, t, PII_IPV4_RE],
        ).fetchone()
        assert got[i] == (red, ne, np_, ni), (i, t, got[i], (red, ne, np_, ni))
    con.close()


# ── repetition stats ───────────────────────────────────────────────────────

def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    r = _one(curation.repetition_stats(df, "text", "doc_id"))
    assert r["n_tokens"] == 4 and r["n_distinct"] == 2
    assert r["distinct_ratio"] == 0.5
    assert r["top_token_frac"] == 0.75
    # bigrams: "a a", "a a", "a b" → top mass 2/3
    assert r["top_bigram_frac"] == round(2 / 3, 6)
    assert r["keep"] is False  # hyper-repetitive


def test_repetition_stats_single_token_doc(spark):
    """A doc with no bigrams must survive the left join with frac 0.0, and
    whitespace runs collapse (tokenizer parity with the oracle)."""
    df = spark.createDataFrame([(1, "  solo   ")], "doc_id long, text string")
    r = _one(curation.repetition_stats(df, "text", "doc_id"))
    assert r["n_tokens"] == 1 and r["n_distinct"] == 1
    assert r["top_bigram_frac"] == 0.0
    assert r["keep"] is False  # top_token_frac = 1.0 > cutoff


def test_repetition_stats_diverse_doc_keeps(spark):
    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(curation.repetition_stats(df, "text", "doc_id"))
    assert r["distinct_ratio"] == 1.0 and r["keep"] is True


def test_repetition_sorted_run_matches_exploded_form(spark, sf_dir):
    """The shuffle-free sorted-run formulation must equal the explode +
    two-level-agg reference on the full fixture corpus AND on edge docs
    (all-same tokens, zero-token rows dropped by both)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [(100001, "x x x x"), (100002, "  "), (100003, "a"), (100004, "a b a b")],
        "doc_id long, text string",
    ).select("doc_id", "text")
    both = docs.select("doc_id", "text").unionByName(edge)
    a = sorted(map(tuple, curation.repetition_stats(both, "text", "doc_id").collect()))
    b = sorted(map(tuple, curation.repetition_stats_exploded(both, "text", "doc_id").collect()))
    assert a == b
    ids = {r[0] for r in a}
    assert 100002 not in ids and {100001, 100003, 100004} <= ids


def test_repetition_stats_plan_is_shuffle_free(spark):
    """The 100 TB claim, machine-checked: no Exchange in the physical plan
    (a per-partition scan end-to-end)."""
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = curation.repetition_stats(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_max_run_expr_known_values(spark):
    import pyspark.sql.functions as F

    df = spark.range(1)
    vals = df.select(
        curation.max_run_expr(F.array(*[F.lit(x) for x in ["a", "a", "b", "b", "b", "c"]])).alias("m"),
        curation.max_run_expr(F.array().cast("array<string>")).alias("empty"),
        curation.max_run_expr(F.array(F.lit("z"))).alias("one"),
    ).collect()[0]
    assert (vals["m"], vals["empty"], vals["one"]) == (3, 0, 1)


def test_ngrams_expr_preserves_multiplicity(spark):
    """ngrams_expr must NOT distinct (contrast shingles_expr): counts need
    every occurrence."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("x y x y x",)], "t string")
    out = df.select(curation.ngrams_expr(F.col("t"), 2).alias("g")).collect()[0]["g"]
    assert out == ["x y", "y x", "x y", "y x"]
    short = df.select(curation.ngrams_expr(F.lit("solo"), 2).alias("g")).collect()[0]["g"]
    assert short == []


# ── decontamination ────────────────────────────────────────────────────────

def test_decontaminate_known_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, "a quick brown fox ran off"),   # shares "quick brown fox"
            (2, "totally unrelated words here"),
            (3, "xs"),                           # short-doc whole-text shingle
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in curation.decontaminate(tr, ev, "text", "doc_id").collect()}
    assert rows[1]["contaminated"] is True and rows[1]["n_contam"] == 1
    assert rows[2]["contaminated"] is False and rows[2]["n_contam"] == 0
    assert rows[3]["contaminated"] is False
    # every train doc present (left-join contract)
    assert set(rows) == {1, 2, 3}
    assert rows[1]["contam_frac"] == round(1 / rows[1]["n_shingles"], 6)


def test_curation_exprs_run_in_streaming_micro_batches(spark, sf_dir, tmp_path):
    """PII redaction and repetition stats are stateless projections, so
    they must drop into a Structured Streaming micro-batch unchanged and
    match their batch twins — the shape a streaming ingest pipeline uses
    to curate documents on arrival."""
    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table

    src = str(tmp_path / "docs_src")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    # one pass: redact, then score the redacted text — both are stateless
    # projections, so no watermark or output-mode gymnastics needed
    curated = curation.repetition_stats(
        stream.select(
            "doc_id", curation.redact_pii_expr(F.col("text")).alias("text")
        ),
        "text",
        "doc_id",
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM curated_stream").collect()))
    want = sorted(
        map(
            tuple,
            curation.repetition_stats(
                docs.select(
                    "doc_id", curation.redact_pii_expr(F.col("text")).alias("text")
                ),
                "text",
                "doc_id",
            ).collect(),
        )
    )
    assert got == want and len(got) == 50


def test_decontaminate_eval_side_broadcast(spark):
    """The 100 TB shape: the eval dictionary must reach the join as a
    broadcast (train side streams, no shuffle on the shingle key)."""
    ev = spark.createDataFrame([(100, "one two three")], "doc_id long, text string")
    tr = spark.createDataFrame([(1, "one two three four")], "doc_id long, text string")
    plan = curation.decontaminate(tr, ev, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_curation_ledger_consistent_with_components(spark, sf_dir):
    """The ledger must agree with the component queries it composes: its
    kept-set equals curated_corpus ∩ repetition-keep ∩ not-contaminated
    (within the train slice), and every drop_reason points at a stage
    whose component query actually fails that doc."""
    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans import llmdata

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import textanalysis as ta

    led = {r["doc_id"]: r["drop_reason"] for r in llmdata.curation_ledger(spark, sf_dir).collect()}
    train_ids = set(led)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the ledger's audit profile: strict quality gate + fingerprint-keyed
    # exact stage (see CURATION_QUALITY_GATE rationale) + the r11
    # gopher/perplexity stages under the LEDGER_* profile
    strict_q = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", ta.quality_score(F.col("text")).alias("q")
        ).collect()
        if r["q"] >= llmdata.CURATION_QUALITY_GATE
    }
    gopher_ok = {
        r["doc_id"]
        for r in llmdata._ledger_gopher_ok(docs).collect()
        if r["g_ok"]
    }
    ppl_ok = {
        r["doc_id"]
        for r in llmdata._ledger_ppl_ok(docs).collect()
        if r["ppl_ok"]
    }
    clf_ok = {
        r["doc_id"]
        for r in llmdata._ledger_clf_ok(docs).collect()
        if r["clf_ok"]
    }
    fp_keep = {
        r["doc_id"]
        for r in docs.groupBy(ta.fingerprint(F.col("text")).alias("fpk"))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    near_nonkeep = {
        r["doc_id"]
        for r in llmdata.dedup_clusters(spark, sf_dir).collect()
        if not r["is_keeper"]
    }
    rep_keep = {r["doc_id"] for r in llmdata.docs_repetition(spark, sf_dir).collect() if r["keep"]}
    contam = {r["doc_id"] for r in llmdata.decontaminate_train(spark, sf_dir).collect() if r["contaminated"]}

    kept = {d for d, reason in led.items() if reason is None}
    assert kept == (
        train_ids & strict_q & gopher_ok & ppl_ok & clf_ok & fp_keep & rep_keep
    ) - near_nonkeep - contam
    # ONE profile: the ledger's kept set is exactly the shipped corpus
    # (curated_corpus under the ledger's gate profile) surviving the
    # downstream gates - the audit explains the corpus that trains, not a
    # hypothetical stricter pipeline
    curated = {
        r["doc_id"]
        for r in llmdata.curated_corpus(
            spark,
            sf_dir,
            gopher=True,
            perplexity_max_ce=llmdata.LEDGER_MAX_CE,
            classifier=True,
        ).collect()
    }
    assert kept == (curated & rep_keep & train_ids) - contam
    for d, reason in led.items():
        if reason == "quality":
            assert d not in strict_q, d
        elif reason == "gopher":
            assert d in strict_q and d not in gopher_ok, d
        elif reason == "perplexity":
            assert d in strict_q and d in gopher_ok and d not in ppl_ok, d
        elif reason == "classifier":
            assert (
                d in strict_q and d in gopher_ok and d in ppl_ok
                and d not in clf_ok
            ), d
        elif reason == "exact_dup":
            assert d in strict_q and d not in fp_keep, d
        elif reason == "near_dup":
            assert d in near_nonkeep, d
        elif reason == "repetition":
            assert d not in rep_keep, d
        elif reason == "contaminated":
            assert d in contam, d
    # every stage of the audit must fire on the fixture — a ledger whose
    # reasons never occur audits nothing (VERDICT r5 #3)
    reasons = {r for r in led.values() if r}
    assert kept and reasons == {
        "quality",
        "gopher",
        "perplexity",
        "classifier",
        "exact_dup",
        "near_dup",
        "repetition",
        "contaminated",
    }


# ── sequence packing ───────────────────────────────────────────────────────

def test_pack_sequences_known_layout(spark):
    """Hand-computed layout: one shard, max_len 10. Docs of 4/8/3 tokens:
    doc1 [0,4) chunk 0; doc2 [4,12) chunks 0-1 (spans); doc3 [12,15)
    chunk 1. Plus an empty doc pinned to its start chunk."""
    docs = spark.createDataFrame(
        [(0, "a b c d"), (8, "a b c d e f g h"), (16, "a b c"), (24, " ")],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in curation.pack_sequences(docs, "text", "doc_id", max_len=10, n_shards=1).collect()
    }
    assert (rows[0]["start_offset"], rows[0]["chunk_first"], rows[0]["chunk_last"]) == (0, 0, 0)
    assert (rows[8]["start_offset"], rows[8]["chunk_first"], rows[8]["chunk_last"]) == (4, 0, 1)
    assert rows[8]["spans_boundary"] is True
    assert (rows[16]["start_offset"], rows[16]["chunk_first"], rows[16]["chunk_last"]) == (12, 1, 1)
    assert rows[16]["spans_boundary"] is False
    assert (rows[24]["n_tok"], rows[24]["chunk_first"], rows[24]["chunk_last"]) == (0, 1, 1)


def test_pack_sequences_invariants_and_shard_parallelism(spark, sf_dir):
    """On the fixture corpus: offsets are contiguous within each shard
    (no gaps, no overlaps), chunk ids are consistent with offsets, and
    the physical plan partitions the window by shard (never a global
    single-partition sort)."""
    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = curation.pack_sequences(docs, "text", "doc_id", max_len=512, n_shards=8)
    rows = out.collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["id"])):
        nxt = by_shard.get(r["shard"], 0)
        assert r["start_offset"] == nxt, (r["shard"], r["id"])
        by_shard[r["shard"]] = nxt + r["n_tok"]
        assert r["chunk_first"] == r["start_offset"] // 512
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan


def test_pack_sequences_duplicate_ids_and_null_text(spark):
    """Round-5 review regressions: (1) duplicate ids within a shard must
    still produce contiguous non-overlapping offsets (explicit ROWS frame;
    the default RANGE frame gave tied rows one shared cumulative value),
    (2) null text occupies 0 tokens instead of corrupting later offsets."""
    docs = spark.createDataFrame(
        [(5, "a b c d"), (5, "x y z w v a"), (7, None), (9, "q r")],
        "doc_id long, text string",
    )
    rows = sorted(
        curation.pack_sequences(docs, "text", "doc_id", max_len=100, n_shards=1).collect(),
        key=lambda r: (r["id"], r["start_offset"]),
    )
    # the two id=5 docs: contiguous [0,4) and [4,10), never overlapping
    assert [(r["id"], r["start_offset"], r["n_tok"]) for r in rows] == [
        (5, 0, 4), (5, 4, 6), (7, 10, 0), (9, 10, 2),
    ]


def test_tokenizer_whitespace_class_cross_engine(spark):
    """Round-5 review regression: Java \\s includes vertical tab, RE2's
    does not — the oracles now spell the 6-char ASCII class explicitly, so
    both engines must tokenize VT/FF identically, and treat NBSP as
    content (not whitespace) identically."""
    import duckdb

    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.dedup import tokens_expr

    cases = ["a\x0bb c", "a\x0cb", "x\ty z", "n bsp stays", "plain text"]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = [r[0] for r in df.select(tokens_expr(F.col("text"))).collect()]
    con = duckdb.connect()
    for t, g in zip(cases, got):
        want = con.execute(
            r"select list_filter(regexp_split_to_array(lower(?), '[ \t\n\v\f\r]+'), t -> t <> '')",
            [t],
        ).fetchone()[0]
        assert g == want, (repr(t), g, want)


def test_materialize_chunks_rejects_reserved_carry_names(spark):
    """A carry column that collides with an internal working name would be
    silently shadowed mid-plan (e.g. carry=('shard',) would return the
    chunker's OWN shard, not the caller's column); one colliding with an
    output name would emit duplicate columns. Both must raise at entry
    (ADVICE r6), and a legal carry still works."""
    import pytest

    df = spark.createDataFrame(
        [(1, "a b c", "web", 7)], "doc_id long, text string, src string, shard long"
    )
    for bad in ("shard", "chunk_text", "__toks", "token_start"):
        with pytest.raises(ValueError, match="collide"):
            curation.materialize_chunks(df, "text", "doc_id", carry=(bad,))
    ok = curation.materialize_chunks(df, "text", "doc_id", carry=("src",)).collect()
    assert ok and all(r["src"] == "web" for r in ok)


def test_materialize_chunks_every_token_exactly_once(spark, sf_dir):
    """The packing materialization contract (VERDICT r5 "Next round" #4):
    per doc, slices are contiguous half-open intervals covering [0, n_tok)
    exactly once; per chunk, slice lengths sum to max_len except each
    shard's tail chunk; reconstructing each shard's stream from chunk
    slices equals concatenating its docs' tokens in id order."""
    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.dedup import tokens_expr
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table

    MAX_LEN, N_SHARDS = 64, 4  # small windows force many boundary spans
    docs = load_table(spark, sf_dir, "documents")
    rows = curation.materialize_chunks(
        docs, "text", "doc_id", max_len=MAX_LEN, n_shards=N_SHARDS
    ).collect()
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", tokens_expr(F.col("text")).alias("t")).collect()
    }

    # per doc: contiguous cover of [0, n_tok)
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for doc_id, slices in by_doc.items():
        slices.sort(key=lambda r: r["token_start"])
        assert slices[0]["token_start"] == 0
        for a, b in zip(slices, slices[1:]):
            assert a["token_end"] == b["token_start"], doc_id
        assert slices[-1]["token_end"] == len(toks[doc_id])
        # slice text is exactly those tokens
        for s in slices:
            want = " ".join(toks[doc_id][s["token_start"] : s["token_end"]])
            assert s["chunk_text"] == want, (doc_id, s["chunk_uid"])

    # per chunk: full except shard tails; chunk_uid globally unique per chunk
    by_chunk: dict = {}
    tail = {}
    for r in rows:
        by_chunk.setdefault(r["chunk_uid"], []).append(r)
        tail[r["shard"]] = max(tail.get(r["shard"], -1), r["chunk_in_shard"])
    for uid, slices in by_chunk.items():
        total = sum(r["token_end"] - r["token_start"] for r in slices)
        shard, cis = slices[0]["shard"], slices[0]["chunk_in_shard"]
        assert uid == cis * N_SHARDS + shard
        if cis == tail[shard]:
            assert 0 < total <= MAX_LEN
        else:
            assert total == MAX_LEN, uid
        # slices tile the chunk: pos_in_chunk contiguous from 0
        slices.sort(key=lambda r: r["pos_in_chunk"])
        pos = 0
        for s in slices:
            assert s["pos_in_chunk"] == pos
            pos += s["token_end"] - s["token_start"]

    # shard-stream reconstruction
    for shard in tail:
        stream = []
        for r in sorted(
            (r for r in rows if r["shard"] == shard),
            key=lambda r: (r["chunk_in_shard"], r["pos_in_chunk"]),
        ):
            stream.extend(r["chunk_text"].split(" "))
        want = []
        for doc_id in sorted(d for d in toks if d % N_SHARDS == shard and toks[d]):
            want.extend(toks[doc_id])
        assert stream == want, shard


def test_materialize_chunks_property_random_corpora(spark):
    """Property-based coverage for the chunk materialization: over random
    corpora (token counts spanning empty → multi-window docs, arbitrary
    ids incl. negatives for the pmod shard rule, random max_len/n_shards)
    every token lands in exactly one chunk, every non-tail chunk is full,
    and shard streams reconstruct exactly. Hypothesis drives the shapes;
    the invariant checker is shared logic with the fixture test."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdefg", min_size=1, max_size=4)

    @st.composite
    def corpus(draw):
        n_docs = draw(st.integers(1, 12))
        docs = []
        used = set()
        for _ in range(n_docs):
            doc_id = draw(
                st.integers(-50, 200).filter(lambda i: i not in used)
            )
            used.add(doc_id)
            n_tok = draw(st.integers(0, 40))
            words = [draw(word) for _ in range(n_tok)]
            docs.append((doc_id, " ".join(words)))
        max_len = draw(st.integers(1, 16))
        n_shards = draw(st.integers(1, 4))
        return docs, max_len, n_shards

    @given(corpus())
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(case):
        docs_rows, max_len, n_shards = case
        df = spark.createDataFrame(docs_rows, "doc_id long, text string")
        rows = curation.materialize_chunks(
            df, "text", "doc_id", max_len=max_len, n_shards=n_shards
        ).collect()
        toks = {d: t.split() for d, t in docs_rows}

        by_doc: dict = {}
        tail: dict = {}
        fill: dict = {}
        for r in rows:
            by_doc.setdefault(r["id"], []).append(r)
            tail[r["shard"]] = max(tail.get(r["shard"], -1), r["chunk_in_shard"])
            fill[r["chunk_uid"]] = fill.get(r["chunk_uid"], 0) + (
                r["token_end"] - r["token_start"]
            )
            assert r["shard"] == r["id"] % n_shards  # python % == pmod
        for doc_id, tk in toks.items():
            if not tk:
                assert doc_id not in by_doc
                continue
            slices = sorted(by_doc[doc_id], key=lambda r: r["token_start"])
            assert slices[0]["token_start"] == 0
            assert slices[-1]["token_end"] == len(tk)
            for a, b in zip(slices, slices[1:]):
                assert a["token_end"] == b["token_start"]
            for s in slices:
                assert s["chunk_text"] == " ".join(
                    tk[s["token_start"] : s["token_end"]]
                )
        for r in rows:
            if r["chunk_in_shard"] != tail[r["shard"]]:
                assert fill[r["chunk_uid"]] == max_len

    check()


def test_materialize_chunks_bpe_units_every_unit_exactly_once(spark, sf_dir):
    """The r12 BPE-token-aware packing contract (VERDICT r11 Next-round
    #1), the whitespace twin's invariants re-proven over SUBWORD units:
    per doc, slices contiguously cover [0, n_units) exactly once; every
    non-tail chunk is exactly max_len units; each shard's unit stream
    reconstructs losslessly from its chunk slices; and the stream
    round-trips through the ``</w>`` markers back to the exact
    whitespace-word stream the encoder consumed."""
    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import bpe
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.dedup import tokens_expr
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import load_table

    MAX_LEN, N_SHARDS = 32, 4  # small windows force many boundary spans
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, n_merges=20, min_count=2)
    enc = bpe.encode_bpe(docs, merges)
    rows = curation.materialize_chunks(
        enc, None, "doc_id", max_len=MAX_LEN, n_shards=N_SHARDS,
        tokens_col="bpe_tokens",
    ).collect()
    units = {r["doc_id"]: list(r["bpe_tokens"]) for r in enc.collect()}
    words = {
        r["doc_id"]: list(r["t"])
        for r in docs.select(
            "doc_id", tokens_expr(F.col("text")).alias("t")
        ).collect()
    }

    # per doc: contiguous cover of [0, n_units), slice = those units
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for doc_id, slices in by_doc.items():
        slices.sort(key=lambda r: r["token_start"])
        assert slices[0]["token_start"] == 0
        for a, b in zip(slices, slices[1:]):
            assert a["token_end"] == b["token_start"], doc_id
        assert slices[-1]["token_end"] == len(units[doc_id])
        for s in slices:
            want = " ".join(units[doc_id][s["token_start"]:s["token_end"]])
            assert s["chunk_text"] == want, (doc_id, s["chunk_uid"])

    # per chunk: exactly MAX_LEN units except each shard's tail
    by_chunk: dict = {}
    tail: dict = {}
    for r in rows:
        by_chunk.setdefault(r["chunk_uid"], []).append(r)
        tail[r["shard"]] = max(tail.get(r["shard"], -1), r["chunk_in_shard"])
    for uid, slices in by_chunk.items():
        total = sum(r["token_end"] - r["token_start"] for r in slices)
        shard, cis = slices[0]["shard"], slices[0]["chunk_in_shard"]
        if cis == tail[shard]:
            assert 0 < total <= MAX_LEN
        else:
            assert total == MAX_LEN, uid

    # shard streams reconstruct, and the </w> markers round-trip the
    # stream back to the exact word sequence the encoder consumed
    for shard in tail:
        stream = []
        for r in sorted(
            (r for r in rows if r["shard"] == shard),
            key=lambda r: (r["chunk_in_shard"], r["pos_in_chunk"]),
        ):
            stream.extend(r["chunk_text"].split(" "))
        want_units, want_words = [], []
        for doc_id in sorted(
            d for d in units if d % N_SHARDS == shard and units[d]
        ):
            want_units.extend(units[doc_id])
            want_words.extend(words[doc_id])
        assert stream == want_units, shard
        got_words = "".join(stream).split(bpe.END)
        assert got_words[-1] == "" and got_words[:-1] == want_words, shard


def test_pack_sequences_tokens_col_counts_units(spark):
    """pack_sequences(tokens_col=) bookkeeps pre-tokenized unit counts:
    n_tok is the array length (NULL array → 0), offsets accumulate over
    units — the ledger twin of the BPE chunk materialization."""
    df = spark.createDataFrame(
        [(0, ["a", "b</w>", "c"]), (4, None), (8, ["x</w>"] * 7)],
        "doc_id long, u array<string>",
    )
    rows = {
        r["id"]: r
        for r in curation.pack_sequences(
            df, None, "doc_id", max_len=4, n_shards=1, tokens_col="u"
        ).collect()
    }
    assert (rows[0]["n_tok"], rows[0]["start_offset"]) == (3, 0)
    assert (rows[4]["n_tok"], rows[4]["start_offset"]) == (0, 3)
    assert (rows[8]["n_tok"], rows[8]["start_offset"]) == (7, 3)
    assert rows[8]["chunk_first"] == 0 and rows[8]["chunk_last"] == 2
    assert rows[8]["spans_boundary"] is True


def test_scrub_boilerplate_property_random_corpora(spark):
    """Property-based coverage for the boilerplate scrub against a direct
    Python reference: over random corpora (docs spanning empty → many
    segments, messy case/whitespace, duplicate segments within one doc,
    random thresholds) every document survives as exactly one row whose
    scrubbed text, segment count, and drop count match the reference's
    distinct-doc-frequency computation."""
    import math as _math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abC \t\r", min_size=1, max_size=6)

    @st.composite
    def corpus(draw):
        n_docs = draw(st.integers(1, 10))
        # a small segment pool forces cross-doc repeats
        pool = [draw(word) for _ in range(draw(st.integers(1, 6)))]
        docs = []
        for i in range(n_docs):
            n_seg = draw(st.integers(0, 6))
            segs = [draw(st.sampled_from(pool + ["uniq%d_%d" % (i, j)])) for j in range(n_seg)]
            docs.append((i, "\n".join(segs) if segs else draw(st.sampled_from(["", None]))))
        frac = draw(st.floats(0.1, 0.9))
        min_docs = draw(st.integers(1, 4))
        min_chars = draw(st.integers(1, 3))
        return docs, frac, min_docs, min_chars

    def ref(docs, frac, min_docs, min_chars):
        import re

        def segments(t):
            return re.split(r"\n+", t if t is not None else "")

        def norm(seg):
            # squeeze-then-trim, space-only trim: the operator's exact
            # order (str.strip() would also eat \v\f, which the ASCII
            # class deliberately leaves alone)
            return re.sub(r"[ \t\n\r]+", " ", seg.lower()).strip(" ")

        n_docs = len(docs)
        thr = max(min_docs, _math.ceil(frac * n_docs))
        df: dict = {}
        for _i, t in docs:
            seen = set()
            for seg in segments(t):
                n = norm(seg)
                if len(n) >= min_chars and n not in seen:
                    seen.add(n)
                    df[n] = df.get(n, 0) + 1
        out = {}
        for i, t in docs:
            segs = segments(t)
            kept = [
                s
                for s in segs
                if not (len(norm(s)) >= min_chars and df.get(norm(s), 0) >= thr)
            ]
            out[i] = ("\n".join(kept), len(segs), len(segs) - len(kept))
        return out

    @given(corpus())
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(case):
        docs, frac, min_docs, min_chars = case
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_segs"], r["n_dropped"])
            for r in curation.scrub_boilerplate(
                df,
                min_doc_frac=frac,
                min_docs=min_docs,
                min_seg_chars=min_chars,
            ).collect()
        }
        assert got == ref(docs, frac, min_docs, min_chars)

    check()


# ── boilerplate scrub increment (r8) ────────────────────────────────────────


def _inc_scrub(spark, rows, idx, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.scrub_boilerplate_increment(df, idx, **kw)
    got = {
        r["doc_id"]: (r["text"], r["n_segs"], r["n_dropped"])
        for r in out.collect()
    }
    out.unpersist()
    return got


def test_scrub_increment_fresh_index_equals_batch(spark, tmp_path):
    """One increment over a whole corpus on an empty index must reproduce
    the batch scrub exactly (history df 0, same total-docs threshold)."""
    rows = [
        (1, "cookie banner\nreal one\nfooter"),
        (2, "cookie banner\nreal two\nfooter"),
        (3, "cookie banner\nreal three"),
    ]
    idx = str(tmp_path / "bp_idx")
    got = _inc_scrub(spark, rows, idx, min_doc_frac=0.5, min_docs=2)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r["doc_id"]: (r["text"], r["n_segs"], r["n_dropped"])
        for r in curation.scrub_boilerplate(
            df, min_doc_frac=0.5, min_docs=2
        ).collect()
    }
    assert got == want
    assert got[3] == ("real three", 2, 1)  # 'cookie banner' df=3 >= 2


def test_scrub_increment_history_accumulates(spark, tmp_path):
    """A segment below threshold within one delta drops once HISTORY
    pushes its combined df over; the frac threshold applies to the
    accumulated doc total."""
    idx = str(tmp_path / "bp_idx2")
    # batch 0: 'promo line' df=1 — kept everywhere (threshold max(2, ...))
    g0 = _inc_scrub(
        spark,
        [(1, "promo line\nalpha"), (2, "beta only")],
        idx,
        min_doc_frac=0.1,
        min_docs=2,
    )
    assert g0[1] == ("promo line\nalpha", 2, 0)
    # batch 1: one more 'promo line' doc -> combined df = 2 >= min_docs
    g1 = _inc_scrub(
        spark,
        [(3, "promo line\ngamma"), (4, "delta only")],
        idx,
        min_doc_frac=0.1,
        min_docs=2,
    )
    assert g1[3] == ("gamma", 2, 1)
    assert g1[4] == ("delta only", 1, 0)
    # batch 0's output was already returned unscathed — immutable history
    # (divergence from a batch re-scrub, pinned separately below)


def test_scrub_increment_idempotent_rerun(spark, tmp_path):
    """Re-running the same delta with an explicit batch_id reproduces the
    output and does NOT double-count its frequencies in the index."""
    idx = str(tmp_path / "bp_idx3")
    rows0 = [(1, "shared seg\none"), (2, "shared seg\ntwo")]
    a = _inc_scrub(spark, rows0, idx, batch_id=0, min_doc_frac=0.1, min_docs=3)
    b = _inc_scrub(spark, rows0, idx, batch_id=0, min_doc_frac=0.1, min_docs=3)
    assert a == b
    # a third doc: 'shared seg' df must be 2 (not 4) + 1 = 3 -> dropped;
    # if the rerun had double-counted, n_docs would also be 6 and the
    # min_docs=3 threshold would still hold — check the meta count too
    import glob

    meta = spark.read.parquet(*glob.glob(f"{idx}/segmeta/batch=*")).agg(
        {"n_docs": "sum"}
    ).collect()[0][0]
    assert meta == 2
    c = _inc_scrub(spark, [(5, "shared seg\nthree")], idx, min_doc_frac=0.1, min_docs=3)
    assert c[5] == ("three", 2, 1)


def test_scrub_increment_early_batch_divergence_documented(spark, tmp_path):
    """The documented greedy-vs-batch divergence: early documents keep a
    segment that a whole-corpus batch scrub would remove, because they
    shipped before it crossed the threshold; later deltas drop it."""
    idx = str(tmp_path / "bp_idx4")
    early = _inc_scrub(
        spark, [(1, "late boiler\nearly unique")], idx, min_doc_frac=0.1, min_docs=2
    )
    assert early[1][2] == 0  # df=1 at ship time: kept
    late = _inc_scrub(
        spark,
        [(2, "late boiler\nlater unique"), (3, "late boiler\nthird unique")],
        idx,
        min_doc_frac=0.1,
        min_docs=2,
    )
    # combined df = 1 (history) + 2 (delta) = 3 >= 2: dropped from the delta
    assert late[2] == ("later unique", 2, 1)
    assert late[3] == ("third unique", 2, 1)
    # batch over the union WOULD have dropped it from doc 1 as well
    union = spark.createDataFrame(
        [(1, "late boiler\nearly unique"), (2, "late boiler\nlater unique"),
         (3, "late boiler\nthird unique")],
        "doc_id long, text string",
    )
    batch = {
        r["doc_id"]: r["n_dropped"]
        for r in curation.scrub_boilerplate(
            union, min_doc_frac=0.1, min_docs=2
        ).collect()
    }
    assert batch[1] == 1  # the divergence, stated


def test_scrub_boilerplate_crlf_normalization(spark):
    """CRLF corpora: a segment edged by \r (or \t) must normalize equal to
    its clean twin — trim-before-squeeze left a residual edge space and
    the boilerplate escaped removal (r8 review finding, verified live)."""
    rows = [
        (1, "cookie banner\r\nreal one"),
        (2, "cookie banner\nreal two"),
        (3, "\tcookie banner\nreal three"),
    ]
    got = {
        r["doc_id"]: (r["text"], r["n_dropped"])
        for r in curation.scrub_boilerplate(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_doc_frac=0.5,
            min_docs=2,
        ).collect()
    }
    assert got == {
        1: ("real one", 1),
        2: ("real two", 1),
        3: ("real three", 1),
    }


def test_scrub_increment_survives_half_written_batch(spark, tmp_path):
    """Crash between the two index writes (segdf written, segmeta not):
    later increments must keep working, exclude the incomplete batch from
    history, and a re-run of the crashed delta repairs the index."""
    import shutil

    idx = str(tmp_path / "bp_idx5")
    rows0 = [(1, "banner line\none"), (2, "banner line\ntwo")]
    _inc_scrub(spark, rows0, idx, batch_id=0, min_doc_frac=0.1, min_docs=3)
    # simulate the crash: segmeta for batch 0 vanishes
    shutil.rmtree(f"{idx}/segmeta/batch=0")

    # next increment: no PATH_NOT_FOUND, allocates past the half batch,
    # and 'banner line' history df does NOT count (incomplete excluded)
    g = _inc_scrub(spark, [(3, "banner line\nthree")], idx, min_doc_frac=0.1, min_docs=3)
    assert g[3] == ("banner line\nthree", 2, 0)  # df 1 < 3: kept

    # repair: re-run the crashed delta with its batch_id, then the counts
    # participate again (df = 2 history + 1 delta = 3 -> dropped)
    _inc_scrub(spark, rows0, idx, batch_id=0, min_doc_frac=0.1, min_docs=3)
    g2 = _inc_scrub(spark, [(4, "banner line\nfour")], idx, min_doc_frac=0.1, min_docs=3)
    assert g2[4] == ("four", 2, 1)


# ── nightly-delta composition: exact_increment + curate_increment ───────────


def _ids_of(df, col="doc_id"):
    return sorted(r[col] for r in df.select(col).collect())


def test_exact_increment_durable_history_and_idempotence(spark, tmp_path):
    """Night 0 registers keepers; night 1 drops an exact twin of a night-0
    keeper (durable history), collapses within-delta twins to the min id,
    keeps new content, and a re-run of night 1 with the same batch_id is
    idempotent (per-batch overwrite + strict below-id history reads)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.dedup import (
        exact_increment,
    )

    idx = str(tmp_path / "ex_idx")
    n0 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "wholly different words")],
        "doc_id long, text string",
    )
    kept0 = exact_increment(n0, idx, batch_id=0)
    assert _ids_of(kept0) == [1, 2]

    n1 = spark.createDataFrame(
        [
            (10, "gamma beta alpha"),   # token-set twin of doc 1 -> dropped
            (11, "fresh content here"),  # new -> kept
            (12, "fresh content here"),  # within-delta twin of 11 -> dropped
        ],
        "doc_id long, text string",
    )
    kept1 = exact_increment(n1, idx, batch_id=1)
    assert _ids_of(kept1) == [11]
    # idempotent re-run: same delta, same id, same verdicts, no double-count
    kept1b = exact_increment(n1, idx, batch_id=1)
    assert _ids_of(kept1b) == [11]
    fps = spark.read.option("basePath", idx + "/fps").parquet(idx + "/fps")
    assert fps.count() == 3  # batch0: 2 keepers, batch1: 1


def test_curate_increment_full_stack_stage_semantics(spark, tmp_path):
    """One delta through the composed nightly pass with every stage
    enabled: each planted document exercises exactly one gate, and the
    survivor comes out scrubbed + redacted."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.curation import (
        curate_increment,
    )

    boiler = "COOKIE BANNER NAVIGATION"
    good = " ".join(f"w{i} unique{i}" for i in range(20))
    neard = " ".join(good.split()[:-2] + ["tail1", "tail2"])
    eval_text = "held out benchmark question"
    rows = [
        (1, f"{boiler}\n{good}\ncontact someone@example.com"),  # survivor
        (2, f"{boiler}\n{neard}"),          # near-dup of 1's body -> dropped
        (3, f"{boiler}\n{good}\ncontact someone@example.com"),  # exact twin of 1 -> dropped
        (4, "x"),                            # too short -> quality gate
        (5, "spam spam spam spam spam spam spam spam spam spam"),  # repetition
        (6, f"leak {eval_text} inside a long enough document " * 3),  # contaminated
        (7, boiler),                         # fully boilerplate -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(eval_text,)], "text string")
    out = curate_increment(
        df,
        str(tmp_path / "ci_idx"),
        quality_gate=0.3,
        boilerplate_min_doc_frac=0.5,
        boilerplate_min_docs=2,
        neardup_threshold=0.6,
        eval_df=ev,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1}
    assert boiler not in got[1]          # boilerplate line scrubbed
    assert "someone@example.com" not in got[1]  # PII redacted
    assert "unique5" in got[1]           # body survived


def test_curate_increment_two_nights_shared_history(spark, tmp_path):
    """Durable cross-night history for BOTH dedup stages through one index
    root: night 2's exact twin and near-dup of night-1 keepers are dropped
    without re-reading night 1, and fresh content passes."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.curation import (
        curate_increment,
    )

    idx = str(tmp_path / "nn_idx")
    base = " ".join(f"tok{i:02d} filler{i:02d}" for i in range(20))
    near = " ".join(base.split()[:-2] + ["delta1", "delta2"])
    fresh = " ".join(f"new{i:02d} words{i:02d}" for i in range(20))

    n1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    assert _ids_of(curate_increment(n1, idx)) == [1]

    n2 = spark.createDataFrame(
        [(10, base), (11, near), (12, fresh)], "doc_id long, text string"
    )
    assert _ids_of(curate_increment(n2, idx)) == [12]


def test_curate_increment_continues_stream_history(spark, tmp_path):
    """The SCALE.md interop claim, driven end-to-end: a stream generation
    (run_stream_curation with the near-dup + boilerplate stages pointed at
    one index root) accepts keepers; a later batch curate_increment over
    the SAME root drops the delta's near-dup of a stream keeper without
    re-reading the stream's corpus, and keeps fresh content."""
    import os

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.curation import (
        curate_increment,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming import (
        pipeline,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "shared_idx")
    base = " ".join(f"iw{i:02d} body{i:02d}" for i in range(20))
    near = " ".join(base.split()[:-2] + ["night1", "night2"])
    fresh = " ".join(f"fr{i:02d} new{i:02d}" for i in range(20))

    src = str(tmp_path / "io_src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, base, "2024-01-01 10:00:00")], "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = pipeline.run_stream_curation(
        stream,
        str(tmp_path / "io_sink"),
        str(tmp_path / "io_ckpt"),
        neardup_threshold=0.6,
        neardup_index_dir=root,
        boilerplate_min_doc_frac=0.5,
        boilerplate_min_docs=2,
        boilerplate_index_dir=root,
    )
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(root, "sigs"))  # stream wrote keepers

    # nightly batch delta over the same root: near-dup of the stream
    # keeper dropped, fresh doc kept
    delta = spark.createDataFrame(
        [(10, near), (11, fresh)], "doc_id long, text string"
    )
    kept = curate_increment(
        delta,
        root,
        boilerplate_min_doc_frac=0.5,
        boilerplate_min_docs=2,
        neardup_threshold=0.6,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [11]


def test_curate_increment_perplexity_gate_parity_slot(spark, tmp_path):
    """The batch LM gate (r10) is the stream's gate EXPRESSION in the
    stream's slot: an out-of-domain doc (all-OOV under the reference
    model) is dropped before any index stage, an in-domain doc ships;
    a ceiling without a model raises."""
    from pyspark.sql import functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import lm

    # diverse reference vocab: the in-domain doc must also survive the
    # later repetition gate (distinct-token ratio), so every token is
    # unique within the doc
    ref = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50))) for i in range(4)],
        ["doc_id", "text"],
    )
    stats = lm.unigram_lm_stats(ref)
    in_dom = " ".join(f"w{j}" for j in range(40))
    out_dom = " ".join(f"zz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, in_dom), (2, out_dom)], ["doc_id", "text"]
    )
    m, oov = lm.collect_lm_expr_model(*stats)
    ce = {
        r["doc_id"]: r["ce"]
        for r in df.select(
            "doc_id", lm.perplexity_ce_expr(F.col("text"), m, oov).alias("ce")
        ).collect()
    }
    ceiling = (ce[1] + ce[2]) / 2

    out = curation.curate_increment(
        df,
        str(tmp_path / "ppl_idx"),
        batch_id=0,
        perplexity_max_ce=ceiling,
        perplexity_lm=stats,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]

    with pytest.raises(ValueError, match="perplexity_lm"):
        curation.curate_increment(
            df, str(tmp_path / "ppl_idx2"), batch_id=0, perplexity_max_ce=1.0
        )


def test_curate_increment_classifier_gate_parity_slot(spark, tmp_path):
    """The batch classifier gate (r11) is the stream's gate EXPRESSION in
    the stream's slot: docs scoring below the threshold under the
    pre-trained hashed model drop before any index stage; a threshold
    without model+bucket-count raises."""
    from pyspark.sql import functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import classifier
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        dsir_bucket_rows,
    )

    labeled = [
        (1, "spark shuffle join spark", 1.0),
        (2, "merge rows batch", 0.0),
        (3, "spark window spark", 1.0),
        (4, "batch rows rows merge", 0.0),
    ]
    N_BKT = 1024
    ref = spark.createDataFrame([(i, t) for i, t, _ in labeled], ["id", "text"])
    feats = (
        dsir_bucket_rows(ref, "text", id_col="id", n_buckets=N_BKT)
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("double").alias("x"))
    )
    labels = spark.createDataFrame([(i, y) for i, _, y in labeled], ["id", "y"])
    model = classifier.train_logreg_hashed(feats, labels, n_iters=25, lr=5.0)

    # arriving docs sized to pass the repetition gate (unique fillers)
    def _doc(i, signal):
        return " ".join(signal.split() + [f"q{i}z{j}" for j in range(36)])

    df = spark.createDataFrame(
        [(10, _doc(10, "spark join spark window")),
         (11, _doc(11, "rows merge batch rows"))],
        ["doc_id", "text"],
    )
    wmap, bias = classifier.collect_hashed_model(model)
    scores = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            classifier.score_hashed_expr(F.col("text"), wmap, bias, N_BKT).alias("s"),
        ).collect()
    }
    want = sorted(i for i, s in scores.items() if s >= 0.5)
    assert want and want != sorted(scores)  # gate non-vacuous

    out = curation.curate_increment(
        df,
        str(tmp_path / "clf_idx"),
        batch_id=0,
        classifier_min_score=0.5,
        classifier_model=model,
        classifier_n_buckets=N_BKT,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == want

    with pytest.raises(ValueError, match="classifier_model"):
        curation.curate_increment(
            df, str(tmp_path / "clf_idx2"), batch_id=0, classifier_min_score=0.5
        )


def test_decontam_min_hits_threshold(spark, tmp_path):
    """r12 overlap-threshold decontamination: min_hits=1 (default) drops
    on ANY shared shingle; min_hits=2 keeps the single-coincidence doc
    and still drops the real leak — plumbed through curate_increment as
    decontam_min_hits."""
    ev = spark.createDataFrame(
        [(900, "benchmark answer key follows for the held out split")],
        "doc_id long, text string",
    )
    # doc 1: one shared 3-shingle ("benchmark answer key") inside unrelated
    # text; doc 2: a 5-token verbatim span = three shared 3-shingles
    filler = lambda p: " ".join(f"{p}{i} pad{p}{i}" for i in range(10))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, f"{filler('a')} benchmark answer key {filler('b')}"),
            (2, f"{filler('c')} benchmark answer key follows for {filler('d')}"),
            (3, f"{filler('e')} nothing shared at all {filler('f')}"),
        ],
        "doc_id long, text string",
    )
    ev_dict = curation.eval_shingle_dict(ev, "text", 3)

    kept1 = {
        r["doc_id"]
        for r in curation.decontam_anti_join(docs, ev_dict, "text", "doc_id", 3).collect()
    }
    assert kept1 == {3}
    kept2 = {
        r["doc_id"]
        for r in curation.decontam_anti_join(
            docs, ev_dict, "text", "doc_id", 3, min_hits=2
        ).collect()
    }
    assert kept2 == {1, 3}  # the single-shingle coincidence survives

    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_hits"):
        curation.decontam_anti_join(docs, ev_dict, "text", "doc_id", 3, min_hits=0)

    # curate_increment plumbing: same kept sets end to end
    out = curation.curate_increment(
        docs, str(tmp_path / "dmh_idx"), neardup_threshold=None,
        eval_df=ev, decontam_min_hits=2,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_stream_decontam_min_hits_parity(spark, tmp_path):
    """The stream's decontam_min_hits drops exactly the batch twin's set
    (shared decontam_anti_join definition, threshold plumbed)."""
    import os

    import pyspark.sql.functions as F

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.streaming import pipeline

    ev = spark.createDataFrame(
        [(900, "benchmark answer key follows for the held out split")],
        "doc_id long, text string",
    )
    filler = lambda p: " ".join(f"{p}{i} pad{p}{i}" for i in range(10))  # noqa: E731
    rows = [
        (1, f"{filler('a')} benchmark answer key {filler('b')}", "2024-01-01 10:00:00"),
        (2, f"{filler('c')} benchmark answer key follows for {filler('d')}", "2024-01-01 10:01:00"),
        (3, f"{filler('e')} nothing shared at all {filler('f')}", "2024-01-01 10:02:00"),
    ]
    src = str(tmp_path / "dmh_src")
    os.makedirs(src)
    spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("append").parquet(src)
    sink = str(tmp_path / "dmh_sink")
    q = pipeline.run_stream_curation(
        spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src),
        sink, str(tmp_path / "dmh_ckpt"), eval_df=ev, decontam_min_hits=2,
    )
    q.awaitTermination(120)
    assert {
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    } == {1, 3}
