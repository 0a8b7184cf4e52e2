"""Exact substring-level dedup (Lee et al. 2022 ExactSubstr —
operators/dedup.drop_duplicate_spans / substring_increment): brute-force
reference parity, edge cases, and the durable-index increment contract.
The registry-level DuckDB hash parity for the `dedup_substring` query runs
in tests/test_oracle_parity.py like every other oracle."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import dedup

K = 4


def _brute(docs: list[tuple[int, str | None]], k: int = K):
    """Reference implementation: scan occurrences in global (id, pos)
    order; any k-window whose shingle was seen earlier marks its k
    positions cut. Returns {id: (n_tokens, n_cut, n_spans, rebuilt)}."""
    toks = {
        i: [t for t in re.split(r"\s+", (txt or "").lower()) if t]
        for i, txt in docs
    }
    seen: set[tuple[str, ...]] = set()
    cuts: dict[int, set[int]] = {i: set() for i, _ in docs}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - k + 1):
            sh = tuple(tk[p : p + k])
            if sh in seen:
                cuts[i].update(range(p, p + k))
            else:
                seen.add(sh)
    out = {}
    for i, tk in toks.items():
        c = cuts[i]
        spans = sum(1 for p in c if p - 1 not in c)
        rebuilt = " ".join(t for j, t in enumerate(tk) if j not in c)
        out[i] = (len(tk), len(c), spans, rebuilt)
    return out


CORPUS = [
    # 0: source of the shared span "alpha beta gamma delta epsilon zeta"
    (0, "alpha beta gamma delta epsilon zeta unique tail here now"),
    # 1: repeats doc 0's span mid-text → span cut from doc 1 only
    (1, "intro words alpha beta gamma delta epsilon zeta closing remark"),
    # 2: repeats a span TWICE within itself → second occurrence cut
    (2, "one two three four five stop one two three four five end"),
    # 3: whole-doc duplicate of doc 0 → every window duplicated, text empties
    (3, "alpha beta gamma delta epsilon zeta unique tail here now"),
    # 4: shorter than k tokens → no windows, never cut
    (4, "tiny doc"),
    # 5: empty text
    (5, ""),
    # 6: NULL text
    (6, None),
    # 7: untouched doc (no shared window)
    (7, "completely fresh words that appear nowhere else at all"),
]


def test_drop_duplicate_spans_matches_bruteforce(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["n_spans"], r["text"])
        for r in dedup.drop_duplicate_spans(
            df, "text", "doc_id", k=K, keep_uncut=True
        ).collect()
    }
    assert got == _brute(CORPUS)
    # sanity on the interesting rows, independent of the reference impl:
    # doc 1 lost exactly the 6-token shared span, doc 3 emptied entirely
    assert got[1][3] == "intro words closing remark" and got[1][1] == 6
    assert got[3] == (10, 10, 1, "")
    # doc 2's intra-doc repeat: the SECOND occurrence (5 tokens) cut
    assert got[2][3] == "one two three four five stop end"
    # short/empty/null/fresh docs untouched
    for i in (4, 5, 6, 7):
        assert got[i][1] == 0 and got[i][2] == 0


def test_drop_duplicate_spans_default_omits_uncut(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    ids = {
        r["doc_id"]
        for r in dedup.drop_duplicate_spans(df, "text", "doc_id", k=K).collect()
    }
    assert ids == {1, 2, 3}


def test_substring_increment_bootstrap_equals_batch(spark, tmp_path):
    """One increment over the whole corpus ≡ the batch operator (fresh
    index, no history): same cuts, same rebuilt text."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = {
        r["doc_id"]: (r["n_cut"], r["text"])
        for r in dedup.drop_duplicate_spans(
            df, "text", "doc_id", k=K, keep_uncut=True
        ).collect()
    }
    inc = dedup.substring_increment(
        df, str(tmp_path / "idx"), "text", "doc_id", k=K
    )
    got = {r["doc_id"]: (r["n_cut"], r["text"]) for r in inc.collect()}
    inc.unpersist()
    assert got == batch


def test_substring_increment_cuts_against_history(spark, tmp_path):
    """A span registered by batch 0 is cut from a LATER delta even though
    the delta itself contains it only once — and batch-0 docs keep their
    text (already-returned documents are immutable, the documented
    early-batch divergence)."""
    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame([CORPUS[0]], "doc_id long, text string")
    out0 = dedup.substring_increment(b0, idx, "text", "doc_id", k=K)
    assert out0.collect()[0]["n_cut"] == 0
    out0.unpersist()

    b1 = spark.createDataFrame([CORPUS[1]], "doc_id long, text string")
    out1 = dedup.substring_increment(b1, idx, "text", "doc_id", k=K)
    row = out1.collect()[0]
    out1.unpersist()
    assert row["n_cut"] == 6 and row["text"] == "intro words closing remark"


def test_substring_increment_idempotent_rerun(spark, tmp_path):
    """Re-running the same delta with an explicit batch_id reproduces the
    result (per-batch overwrite + strict below-id history reads) instead
    of self-contaminating against its own first run's hashes."""
    idx = str(tmp_path / "idx")
    df = spark.createDataFrame(CORPUS[:2], "doc_id long, text string")
    first = dedup.substring_increment(df, idx, "text", "doc_id", k=K, batch_id=0)
    a = sorted(map(tuple, first.collect()))
    first.unpersist()
    again = dedup.substring_increment(df, idx, "text", "doc_id", k=K, batch_id=0)
    b = sorted(map(tuple, again.collect()))
    again.unpersist()
    assert a == b
    # doc 1 still has its span (first occurrence in doc 0 within the SAME
    # delta marks doc 1's copy, not doc 1's whole text)
    assert [r for r in b if r[0] == 1][0][1] == 10


def test_substring_increment_index_grows_new_hashes_only(spark, tmp_path):
    """Batch 1's index delta registers only UNSEEN window hashes — the
    index grows O(new vocabulary), not O(re-observed occurrences)."""
    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame([CORPUS[0]], "doc_id long, text string")
    dedup.substring_increment(b0, idx, "text", "doc_id", k=K).unpersist()
    # delta = an exact copy of doc 0 → zero new hashes
    b1 = spark.createDataFrame(
        [(99, CORPUS[0][1])], "doc_id long, text string"
    )
    out = dedup.substring_increment(b1, idx, "text", "doc_id", k=K)
    assert out.collect()[0]["text"] == ""
    out.unpersist()
    batch1 = spark.read.parquet(f"{idx}/spanfps/batch=1")
    assert batch1.count() == 0


def test_curate_increment_substring_stage(spark, tmp_path):
    """The opt-in curate_increment stage: duplicated spans are cut from
    the curated delta's text, and a doc whose text was ALL duplicate
    spans drops entirely (scrub_replace_join's empty-text rule)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.curation import curate_increment

    # docs long enough to clear the downstream repetition gate (its
    # top-bigram-frac ≤ 0.06 bound needs ≥ ~18 tokens even for fully
    # distinct text) — both before AND after the span cut. Doc 0 carries
    # MIXED CASE + a newline: an UNCUT doc must keep its original
    # formatting, not the normalized token stream (r11 self-review).
    span = "sierra tango uniform victor whiskey xray"
    filler_a = " ".join(f"AW{i}" for i in range(23)) + "\naw23"
    filler_b = " ".join(f"bw{i}" for i in range(24))
    df = spark.createDataFrame(
        [
            (0, f"{filler_a} {span}"),
            (1, f"{filler_b} {span}"),
            (3, f"{filler_a} {span}"),  # whole-doc duplicate of 0
        ],
        "doc_id long, text string",
    )
    out = curate_increment(
        df,
        str(tmp_path / "idx"),
        "text",
        "doc_id",
        substring_k=K,
        neardup_threshold=None,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 3 is a whole-doc exact duplicate — the EXACT stage drops it
    # before the substring stage ever sees it; doc 1 loses the span
    assert set(got) == {0, 1}
    # UNCUT doc 0 keeps original case + newline, byte for byte
    assert got[0] == f"{filler_a} {span}"
    assert got[1] == filler_b


def test_duplicate_span_cuts_hot_hash_cap(spark):
    """max_window_df excludes mega-repeated windows from marking (the
    Jaccard stop-shingle discipline): with the cap below the hot span's
    df nothing is cut; without it the repeats are."""
    hot = "lorem ipsum dolor sit"
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b {hot} u{i}c") for i in range(6)],
        "doc_id long, text string",
    )
    uncapped = dedup.drop_duplicate_spans(docs, "text", "doc_id", k=K)
    assert uncapped.count() == 5  # every non-first occurrence cut
    capped = dedup.drop_duplicate_spans(
        docs, "text", "doc_id", k=K, max_window_df=3
    )
    assert capped.count() == 0  # hot hash (df 6 > 3) excluded entirely
